"""OpenAI server tests over real HTTP (aiohttp test client), tiny model.

Mirrors the reference's tests/entrypoints/openai/ pattern (RemoteOpenAIServer
spinning a real server and exercising the HTTP API). pytest-asyncio is not in
the image, so each test drives its own event loop.
"""

import asyncio
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402


class FakeTokenizer:
    eos_token_id = 0

    def encode(self, s):
        return [ord(c) % 250 + 1 for c in s][:32]

    def decode(self, ids):
        return "".join(chr(96 + (i % 26)) for i in ids)

    def apply_chat_template(self, messages, tokenize=True, add_generation_prompt=True):
        text = " ".join(m["content"] for m in messages)
        return self.encode(text)


@pytest.fixture
def server():
    from qspec_tpu.config import ModelConfig
    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.openai.api_server import build_server
    from qspec_tpu.models.llama import init_params

    cfg = ModelConfig.tiny(quant="w4")
    params = init_params(cfg, seed=0)
    args = EngineArgs(model="tiny", max_model_len=256, max_num_seqs=4,
                      num_speculative_tokens=2)
    return build_server(args, model_name="tiny-test", params=params,
                        tokenizer=FakeTokenizer())


def _run(server, coro_fn):
    async def runner():
        client = TestClient(TestServer(server.app()))
        await client.start_server()
        try:
            await coro_fn(client)
        finally:
            await client.close()

    asyncio.run(runner())


def test_health_and_models(server):
    async def body(client):
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "tiny-test"

    _run(server, body)


def test_completions(server):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "model": "tiny-test", "prompt": "hello world", "max_tokens": 8,
            "temperature": 0.0})
        assert r.status == 200
        data = await r.json()
        assert data["object"] == "text_completion"
        assert data["usage"]["completion_tokens"] == 8
        assert len(data["choices"][0]["text"]) > 0

    _run(server, body)


def test_concurrent_requests(server):
    async def body(client):
        async def one(i):
            r = await client.post("/v1/completions", json={
                "prompt": f"request {i}", "max_tokens": 6, "temperature": 0.0})
            assert r.status == 200
            return (await r.json())["choices"][0]["text"]

        texts = await asyncio.gather(*(one(i) for i in range(6)))
        assert all(len(t) > 0 for t in texts)

    _run(server, body)


def test_chat_streaming(server):
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "model": "tiny-test",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 6, "temperature": 0.0, "stream": True})
        assert r.status == 200
        chunks = []
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks.append(json.loads(line[6:]))
        assert chunks, "no SSE chunks"
        assert chunks[-1]["choices"][0]["finish_reason"] in ("length", "stop")
        total = "".join(c["choices"][0]["delta"].get("content", "") for c in chunks)
        assert len(total) > 0

    _run(server, body)


def test_tokenize_roundtrip(server):
    async def body(client):
        r = await client.post("/tokenize", json={"prompt": "abc"})
        toks = (await r.json())["tokens"]
        assert len(toks) == 3
        r = await client.post("/detokenize", json={"tokens": toks})
        assert len((await r.json())["prompt"]) == 3

    _run(server, body)


def test_embeddings_endpoint(server):
    async def body(client):
        r = await client.post("/v1/embeddings",
                              json={"input": ["hello world", "hello world",
                                              "something else entirely"]})
        assert r.status == 200
        data = await r.json()
        assert data["object"] == "list" and len(data["data"]) == 3
        import numpy as np
        e0, e1, e2 = (np.asarray(d["embedding"], np.float32)
                      for d in data["data"])
        assert e0.shape == e1.shape and e0.size > 0
        # identical inputs embed identically; different inputs differ
        np.testing.assert_allclose(e0, e1, atol=1e-5)
        assert np.abs(e0 - e2).max() > 1e-3

    _run(server, body)


def test_completions_n_choices(server):
    async def body(client):
        r = await client.post("/v1/completions",
                              json={"prompt": "abcd", "max_tokens": 4, "n": 3,
                                    "temperature": 0.0, "ignore_eos": True})
        assert r.status == 200
        data = await r.json()
        assert [c["index"] for c in data["choices"]] == [0, 1, 2]
        # greedy: all n choices identical
        assert len({c["text"] for c in data["choices"]}) == 1
        assert data["usage"]["completion_tokens"] == 12

    _run(server, body)


def test_chat_n_choices(server):
    async def body(client):
        r = await client.post("/v1/chat/completions",
                              json={"messages": [{"role": "user",
                                                  "content": "hi there"}],
                                    "max_tokens": 3, "n": 2,
                                    "temperature": 0.0, "ignore_eos": True})
        assert r.status == 200
        data = await r.json()
        assert len(data["choices"]) == 2
        assert data["choices"][0]["message"]["content"] == \
            data["choices"][1]["message"]["content"]

    _run(server, body)


def test_batch_runner(server, tmp_path):
    """Offline Batch-API runner (reference run_batch.py): JSONL in/out."""
    import asyncio

    from qspec_tpu.entrypoints.openai.run_batch import run_batch

    inp = tmp_path / "in.jsonl"
    outp = tmp_path / "out.jsonl"
    reqs = [
        {"custom_id": "c1", "method": "POST", "url": "/v1/completions",
         "body": {"prompt": "abcd", "max_tokens": 4, "temperature": 0.0,
                  "ignore_eos": True}},
        {"custom_id": "c2", "method": "POST", "url": "/v1/chat/completions",
         "body": {"messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 3, "ignore_eos": True}},
        {"custom_id": "c3", "method": "POST", "url": "/v1/embeddings",
         "body": {"input": "hello"}},
        {"custom_id": "bad", "method": "POST", "url": "/v1/nope", "body": {}},
    ]
    inp.write_text("\n".join(json.dumps(r) for r in reqs))

    ok = asyncio.new_event_loop().run_until_complete(
        run_batch(server, str(inp), str(outp)))
    assert ok == 3
    lines = [json.loads(l) for l in outp.read_text().splitlines()]
    assert len(lines) == 4
    by_id = {l["custom_id"]: l for l in lines}
    assert by_id["c1"]["response"]["body"]["choices"][0]["text"]
    assert by_id["c2"]["response"]["body"]["choices"][0]["message"]["content"]
    assert by_id["c3"]["response"]["body"]["data"][0]["embedding"]
    assert by_id["bad"]["error"] is not None


def test_stream_content_matches_nonstream(server):
    """Concatenated SSE deltas must equal the non-streaming completion text
    (VERDICT: streaming content correctness)."""
    async def body(client):
        req = {"prompt": "stream me", "max_tokens": 8, "temperature": 0.0,
               "ignore_eos": True}
        r = await client.post("/v1/completions", json=req)
        full = (await r.json())["choices"][0]["text"]

        r = await client.post("/v1/completions", json={**req, "stream": True})
        assert r.status == 200
        text, finish = "", None
        async for line in r.content:
            line = line.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            payload = json.loads(line[6:])
            ch = payload["choices"][0]
            text += ch["text"]
            if ch["finish_reason"]:
                finish = ch["finish_reason"]
        assert text == full
        assert finish == "length"

    _run(server, body)


class MMTokenizer(FakeTokenizer):
    """FakeTokenizer with an <image> special token (id 7)."""
    unk_token_id = 255

    def convert_tokens_to_ids(self, t):
        return 7 if t == "<image>" else None

    def apply_chat_template(self, messages, tokenize=True,
                            add_generation_prompt=True):
        ids = []
        for m in messages:
            for piece in m["content"].split("<image>"):
                ids.extend(self.encode(piece))
                ids.append(7)
            ids.pop()  # no trailing placeholder
        return ids[:48]


def _png_data_url(arr):
    import base64
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr.astype("uint8")).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_chat_with_image_parts():
    """OpenAI image_url content parts (base64 data URLs) run through the
    multimodal splice + prompt-embeds path (reference: VLM chat serving)."""
    import numpy as np

    from qspec_tpu.config import ModelConfig
    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.openai.api_server import build_server
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.multimodal import init_mm_projector

    cfg = ModelConfig.tiny(quant="w4")
    params = init_params(cfg, seed=0)
    params["mm_projector"] = init_mm_projector(cfg.hidden_size)
    args = EngineArgs(model="tiny", max_model_len=256, max_num_seqs=4)
    server = build_server(args, model_name="tiny-mm", params=params,
                          tokenizer=MMTokenizer())
    rng = np.random.default_rng(3)
    # maximally different images so the greedy continuation must diverge
    url1 = _png_data_url(np.zeros((64, 64, 3)))
    url2 = _png_data_url(rng.random((64, 64, 3)) * 255)

    async def body(client):
        def req(url):
            return {"messages": [{"role": "user", "content": [
                {"type": "text", "text": "describe "},
                {"type": "image_url", "image_url": {"url": url}},
            ]}], "max_tokens": 6, "temperature": 0.0, "ignore_eos": True}

        r1 = await client.post("/v1/chat/completions", json=req(url1))
        assert r1.status == 200, await r1.text()
        t1 = (await r1.json())["choices"][0]["message"]["content"]
        r2 = await client.post("/v1/chat/completions", json=req(url2))
        t2 = (await r2.json())["choices"][0]["message"]["content"]
        assert t1 and t2
        assert t1 != t2   # different images steer the continuation

        # remote URLs are rejected (zero-egress host)
        bad = req("https://example.com/cat.png")
        r3 = await client.post("/v1/chat/completions", json=bad)
        assert r3.status == 400

    _run(server, body)


def test_score_endpoint(server):
    """/v1/score: bi-encoder cosine over pooled embeddings; identical texts
    score ~1, and the response shape mirrors the reference serving_score."""
    async def body(client):
        req = {"text_1": "the quick brown fox",
               "text_2": ["the quick brown fox", "completely different"]}
        r = await client.post("/v1/score", json=req)
        assert r.status == 200, await r.text()
        data = (await r.json())["data"]
        assert len(data) == 2
        assert data[0]["score"] == pytest.approx(1.0, abs=1e-3)
        assert data[0]["score"] >= data[1]["score"]
        r = await client.post("/v1/score", json={"text_1": "x"})
        assert r.status == 400

    _run(server, body)


def test_score_endpoint_cross_encoder():
    """/v1/score with a cross-encoder checkpoint (params["score_head"],
    reference serving_score.py + cross-encoder registry classes): each
    (text_1, text_2) pair is encoded JOINTLY through the trunk — the score
    must equal head(pooled(concat(t1, t2))), not any bi-encoder cosine."""
    from qspec_tpu.config import ModelConfig
    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.llm import LLM, cross_encoder_score
    from qspec_tpu.entrypoints.openai.api_server import build_server
    from qspec_tpu.models.llama import init_params

    cfg = ModelConfig.tiny(quant="w4", num_labels=1)
    params = init_params(cfg, seed=0)
    tok = FakeTokenizer()
    args = EngineArgs(model="tiny", max_model_len=256, max_num_seqs=4)
    server = build_server(args, model_name="xenc", params=params,
                          tokenizer=tok)

    # expected: joint pass through an identically-built offline engine
    ref_llm = LLM(model="tiny", params=params, tokenizer=tok,
                  max_model_len=256, max_num_seqs=4)
    t1, t2 = "the quick brown fox", "jumped over"
    want = ref_llm.score(t1, [t2])[0]
    pair = tok.encode(t1) + tok.encode(t2)
    pooled = ref_llm.embed([pair])[0]
    assert want == pytest.approx(cross_encoder_score(
        params["score_head"], pooled), abs=1e-5)
    assert 0.0 < want < 1.0    # sigmoid of a single-logit head

    async def body(client):
        r = await client.post("/v1/score",
                              json={"text_1": t1, "text_2": [t2]})
        assert r.status == 200, await r.text()
        data = (await r.json())["data"]
        assert data[0]["score"] == pytest.approx(want, abs=1e-5)

    _run(server, body)


def test_dynamic_lora_endpoints(tmp_path):
    """/v1/load_lora_adapter + unload + adapter-as-model routing
    (reference: vllm entrypoints' dynamic-LoRA endpoints)."""
    import numpy as np

    from qspec_tpu.config import ModelConfig
    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.openai.api_server import build_server
    from qspec_tpu.lora import LoRAConfig, init_lora_params
    from qspec_tpu.models.llama import init_params

    cfg = ModelConfig.tiny(quant="w4")
    params = dict(init_params(cfg, seed=0))
    params["lora"] = init_lora_params(cfg, LoRAConfig(max_loras=3,
                                                      max_rank=16))
    args = EngineArgs(model="tiny", max_model_len=256, max_num_seqs=4)
    server = build_server(args, model_name="tiny-test", params=params,
                          tokenizer=FakeTokenizer())

    # PEFT-style adapter on disk (npz form)
    rng = np.random.default_rng(0)
    sd = {}
    for li in range(cfg.num_layers):
        pre = f"base_model.model.model.layers.{li}.self_attn.q_proj"
        sd[pre + ".lora_A.weight"] = \
            rng.standard_normal((4, cfg.hidden_size)).astype(np.float32)
        sd[pre + ".lora_B.weight"] = \
            rng.standard_normal((cfg.q_size, 4)).astype(np.float32)
    path = str(tmp_path / "adapter_model.npz")
    np.savez(path, **sd)

    async def body(client):
        prompt = "hello world example"
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 8,
                                    "temperature": 0.0})
        base_text = (await r.json())["choices"][0]["text"]

        r = await client.post("/v1/load_lora_adapter",
                              json={"lora_name": "ad1", "lora_path": path})
        assert r.status == 200, await r.text()
        assert (await r.json())["slot"] == 1

        r = await client.get("/v1/models")
        ids = [m["id"] for m in (await r.json())["data"]]
        assert "ad1" in ids

        # 'model': adapter name routes the request through the adapter
        r = await client.post("/v1/completions",
                              json={"model": "ad1", "prompt": prompt,
                                    "max_tokens": 8, "temperature": 0.0})
        ad_text = (await r.json())["choices"][0]["text"]
        assert ad_text != base_text

        r = await client.post("/v1/unload_lora_adapter",
                              json={"lora_name": "ad1"})
        assert r.status == 200
        r = await client.get("/v1/lora_adapters")
        assert (await r.json())["adapters"] == []

        # unknown adapter name falls back to the base model
        r = await client.post("/v1/completions",
                              json={"model": "nope", "prompt": prompt,
                                    "max_tokens": 8, "temperature": 0.0})
        assert (await r.json())["choices"][0]["text"] == base_text

    _run(server, body)


def test_chat_image_url_caption(tmp_path):
    """A /v1/chat/completions request with an image_url data URL against
    the in-image-TRAINED shape captioner returns the image's caption
    ("a COLOR SHAPE") — the end-to-end VLM serving path (reference:
    chat_utils multimodal parsing + llava serving)."""
    import base64
    import glob
    import io
    import json as _json
    import os

    import numpy as np

    ck = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                       "..", "checkpoints",
                                       "vlm_shapes_v*.npz")))
    if not ck:
        pytest.skip("no trained VLM checkpoint (run benchmarks/train_vlm.py)")
    base = ck[-1][:-len(".npz")]
    with open(base + ".json") as f:
        meta = _json.load(f)
    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.openai.api_server import build_server
    from qspec_tpu.model_loader.loader import load_hf_float
    from qspec_tpu.models.registry import resolve

    cfg = resolve(meta["hf_config"])
    params, cfg = load_hf_float(dict(np.load(base + ".npz")), cfg)

    voc = meta["vocab"]
    id2w = {voc["bos"]: "<s>", voc["eos"]: "</s>", voc["a"]: "a",
            voc["image_token"]: "<image>"}
    for w, i in {**voc["colors"], **voc["shapes"]}.items():
        id2w[i] = w
    w2id = {w: i for i, w in id2w.items()}

    class VlmTokenizer:
        def encode(self, s):
            out = []
            for tok in s.replace("<image>", " <image> ").split():
                out.append(w2id.get(tok, 0))
            return out

        def decode(self, ids):
            return " ".join(id2w.get(int(t), "?") for t in ids)

        def convert_tokens_to_ids(self, t):
            return w2id.get(t, -1)

        def apply_chat_template(self, messages, tokenize=True,
                                add_generation_prompt=True):
            toks = [voc["bos"]]
            for m in messages:
                toks += self.encode(m["content"])
            return toks

    # serve from a checkpoint-style dir so the registry resolves the
    # llava config (the production serving path)
    mdir = tmp_path / "vlm"
    mdir.mkdir()
    (mdir / "config.json").write_text(_json.dumps(meta["hf_config"]))
    args = EngineArgs(model=str(mdir), max_model_len=64, max_num_seqs=2,
                      quantization=None)     # bf16 checkpoint
    server = build_server(args, model_name="vlm-shapes", params=params,
                          tokenizer=VlmTokenizer())

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from benchmarks.train_vlm import draw_shape
    from PIL import Image

    rng = np.random.default_rng(123)
    img, color, shape = draw_shape(rng)
    buf = io.BytesIO()
    Image.fromarray((img * 255).astype(np.uint8)).save(buf, format="PNG")
    url = "data:image/png;base64," + \
        base64.b64encode(buf.getvalue()).decode()

    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": url}}]}],
            "max_tokens": 3, "temperature": 0.0})
        assert r.status == 200, await r.text()
        text = (await r.json())["choices"][0]["message"]["content"]
        assert text.strip() == f"a {color} {shape}", text

    _run(server, body)


def test_audio_transcriptions_endpoint(tmp_path):
    """/v1/audio/transcriptions: WAV upload -> in-process log-mel ->
    whisper-family decode (reference: vllm transcription serving)."""
    import io
    import json as _json
    import struct
    import wave as wave_mod

    import numpy as np

    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.openai.api_server import build_server
    from tests.models.test_whisper import tiny_whisper

    _, cfg, params = tiny_whisper()
    hf_dict = {
        "architectures": ["WhisperForConditionalGeneration"],
        "model_type": "whisper", "vocab_size": cfg.vocab_size,
        "d_model": cfg.hidden_size, "encoder_layers": cfg.encoder_layers,
        "decoder_layers": cfg.num_layers,
        "decoder_attention_heads": cfg.num_heads,
        "decoder_ffn_dim": cfg.intermediate_size,
        "num_mel_bins": cfg.whisper_num_mel,
        "max_source_positions": cfg.whisper_max_source_positions,
        "max_target_positions": cfg.max_position_embeddings,
        "decoder_start_token_id": cfg.decoder_start_token_id,
    }
    mdir = tmp_path / "whisper"
    mdir.mkdir()
    (mdir / "config.json").write_text(_json.dumps(hf_dict))
    args = EngineArgs(model=str(mdir), max_model_len=64, max_num_seqs=2,
                      quantization=None)
    server = build_server(args, model_name="whisper-test", params=params,
                          tokenizer=FakeTokenizer())

    # 0.5 s of 440 Hz sine at 16 kHz, 16-bit PCM WAV
    t = np.arange(8000) / 16000.0
    pcm = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    async def body(client):
        import aiohttp
        form = aiohttp.FormData()
        form.add_field("file", buf.getvalue(), filename="a.wav",
                       content_type="audio/wav")
        form.add_field("max_tokens", "8")
        r = await client.post("/v1/audio/transcriptions", data=form)
        assert r.status == 200, await r.text()
        out = await r.json()
        assert isinstance(out["text"], str) and out["text"]

    _run(server, body)
