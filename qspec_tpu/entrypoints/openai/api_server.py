"""OpenAI-compatible HTTP server (aiohttp).

TPU-native analogue of the reference's FastAPI server
(vllm/entrypoints/openai/api_server.py): /v1/models, /v1/completions,
/v1/chat/completions (both streaming SSE and non-streaming), /health,
/metrics (Prometheus), /tokenize, /detokenize. fastapi/uvicorn are not in
this image, so the stack is aiohttp; the wire format matches.
"""

from __future__ import annotations

import argparse
import json
import time
import uuid
from typing import Optional

from aiohttp import web

from qspec_tpu.engine.arg_utils import EngineArgs
from qspec_tpu.engine.async_engine import AsyncLLMEngine
from qspec_tpu.sampling_params import SamplingParams


def _now() -> int:
    return int(time.time())


class OpenAIServer:
    def __init__(self, async_engine: AsyncLLMEngine, model_name: str, tokenizer):
        self.engine = async_engine
        self.model_name = model_name
        self.tokenizer = tokenizer
        self._request_counter = iter(range(1 << 31))

    # ------------------------------------------------------------------
    def app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/health", self.health)
        app.router.add_get("/v1/models", self.models)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/v1/embeddings", self.embeddings)
        app.router.add_post("/v1/score", self.score)
        app.router.add_post("/score", self.score)
        app.router.add_post("/v1/audio/transcriptions",
                            self.transcriptions)
        app.router.add_post("/v1/load_lora_adapter", self.load_lora)
        app.router.add_post("/v1/unload_lora_adapter", self.unload_lora)
        app.router.add_get("/v1/lora_adapters", self.list_lora)
        app.router.add_post("/tokenize", self.tokenize)
        app.router.add_post("/detokenize", self.detokenize)
        app.router.add_get("/metrics", self.metrics)
        return app

    async def transcriptions(self, request):
        """OpenAI /v1/audio/transcriptions for whisper-family models:
        multipart form with a WAV ``file``; the server extracts log-mel
        features in-process (qspec_tpu/audio.py) and decodes greedily
        from the model's forced decoder prompt (reference: vllm's
        transcription serving over models/whisper.py)."""
        cfg = self.engine.engine.config.model
        if cfg.arch != "whisper":
            raise web.HTTPBadRequest(
                reason="transcriptions need a whisper-family model")
        form = await request.post()
        part = form.get("file")
        if part is None:
            raise web.HTTPBadRequest(reason="multipart 'file' required")
        data = part.file.read() if hasattr(part, "file") else bytes(part)
        from qspec_tpu.audio import wav_to_features
        try:
            mel = wav_to_features(
                data, n_mels=cfg.whisper_num_mel,
                max_frames=2 * cfg.whisper_max_source_positions)
        except Exception as e:
            raise web.HTTPBadRequest(reason=f"bad audio: {e}")
        prompt = [cfg.decoder_start_token_id or 0]
        sp = SamplingParams(
            temperature=float(form.get("temperature", 0) or 0),
            max_tokens=int(form.get("max_tokens", 0) or
                           cfg.max_position_embeddings - 8))
        rid = next(self._request_counter)
        final = None
        async for out in self.engine.generate(prompt, sp, request_id=rid,
                                              mm_audio=mel):
            final = out
        text = final.text or (self.tokenizer.decode(final.output_token_ids)
                              if self.tokenizer else "")
        return web.json_response({"text": text})

    # ---- dynamic LoRA lifecycle (reference api_server endpoints
    # /v1/load_lora_adapter + /v1/unload_lora_adapter backed by
    # vllm/lora/models.py LRUCacheLoRAModelManager) ------------------
    def _lora_manager(self):
        from qspec_tpu.lora.manager import LoRASlotError
        try:
            return self.engine.engine.lora
        except LoRASlotError as e:
            raise web.HTTPBadRequest(reason=str(e))

    async def load_lora(self, request):
        from qspec_tpu.lora.manager import LoRASlotError
        body = await request.json()
        name = body.get("lora_name")
        path = body.get("lora_path")
        if not name or not path:
            raise web.HTTPBadRequest(reason="lora_name and lora_path required")
        mgr = self._lora_manager()
        try:
            slot = mgr.load_path(name, path, alpha=body.get("alpha"))
        except (LoRASlotError, FileNotFoundError, KeyError) as e:
            raise web.HTTPBadRequest(reason=f"load failed: {e}")
        return web.json_response({"name": name, "slot": slot})

    async def unload_lora(self, request):
        from qspec_tpu.lora.manager import LoRASlotError
        body = await request.json()
        name = body.get("lora_name")
        if not name:
            raise web.HTTPBadRequest(reason="lora_name required")
        try:
            self._lora_manager().unload(name)
        except LoRASlotError as e:
            raise web.HTTPBadRequest(reason=str(e))
        return web.json_response({"unloaded": name})

    async def list_lora(self, request):
        return web.json_response(
            {"adapters": self._lora_manager().list_adapters()})

    def _lora_name_of(self, body: dict):
        """The OpenAI 'model' field names a loaded adapter (reference:
        request.model routed to an adapter when it matches one)."""
        m = body.get("model")
        if not m or m == self.model_name:
            return None
        lm = self.engine.engine._lora_manager
        if lm is not None and any(a["name"] == m
                                  for a in lm.list_adapters()):
            return m
        return None

    async def health(self, request):
        if not self.engine.is_running():
            return web.Response(status=500, text="engine dead")
        return web.Response(text="ok")

    async def models(self, request):
        data = [{"id": self.model_name, "object": "model",
                 "created": _now(), "owned_by": "qspec_tpu"}]
        lm = self.engine.engine._lora_manager
        if lm is not None:
            # loaded adapters are addressable via the 'model' field
            # (reference: served LoRA modules appear in /v1/models)
            data += [{"id": a["name"], "object": "model",
                      "created": int(a["loaded_at"]),
                      "owned_by": "qspec_tpu", "parent": self.model_name}
                     for a in lm.list_adapters()]
        return web.json_response({"object": "list", "data": data})

    async def metrics(self, request):
        try:
            from prometheus_client import generate_latest
            return web.Response(body=generate_latest(),
                                content_type="text/plain")
        except ImportError:
            return web.Response(status=501, text="prometheus_client missing")

    async def tokenize(self, request):
        body = await request.json()
        ids = self.tokenizer.encode(body["prompt"])
        return web.json_response({"tokens": ids, "count": len(ids)})

    async def detokenize(self, request):
        body = await request.json()
        return web.json_response({"prompt": self.tokenizer.decode(body["tokens"])})

    # ------------------------------------------------------------------
    def _sampling(self, body: dict) -> SamplingParams:
        # OpenAI logit_bias: {token_id: bias}; <= -100 conventionally bans,
        # everything else rides the engine's additive device-side bias
        banned, bias = None, None
        if body.get("logit_bias"):
            banned = [int(t) for t, v in body["logit_bias"].items() if v <= -100]
            bias = {int(t): float(v) for t, v in body["logit_bias"].items()
                    if v > -100}
        stop = body.get("stop")
        return SamplingParams(
            temperature=float(body.get("temperature", 1.0)),
            top_p=float(body.get("top_p", 1.0)),
            top_k=int(body.get("top_k", -1)),
            max_tokens=int(body.get("max_tokens", body.get("max_completion_tokens", 128))),
            min_tokens=int(body.get("min_tokens", 0)),
            ignore_eos=bool(body.get("ignore_eos", False)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            allowed_token_ids=body.get("allowed_token_ids"),
            banned_token_ids=banned or body.get("banned_token_ids"),
            logit_bias=bias or None,
            stop=stop,
            include_stop_str_in_output=bool(
                body.get("include_stop_str_in_output", False)),
            logprobs=body.get("logprobs"),
            seed=body.get("seed"),
        )

    def _encode_prompts(self, body: dict):
        """OpenAI `prompt` may be a string, token-id list, list of strings,
        or list of token-id lists; returns a list of token-id lists."""
        prompt = body.get("prompt")
        if isinstance(prompt, str):
            return [self.tokenizer.encode(prompt)]
        if isinstance(prompt, list):
            if not prompt:
                raise web.HTTPBadRequest(reason="empty prompt list")
            if isinstance(prompt[0], int):
                return [prompt]
            return [p if isinstance(p, list) else self.tokenizer.encode(p)
                    for p in prompt]
        raise web.HTTPBadRequest(reason="prompt must be string or list")

    @staticmethod
    def _logprobs_payload(out, want):
        if not want:
            return None
        top = None
        if out.top_logprobs is not None:
            top = [None if d is None else {str(t): lp for t, lp in d.items()}
                   for d in out.top_logprobs]
        return {"token_logprobs": list(out.logprobs or []),
                "tokens": [str(t) for t in out.output_token_ids],
                "top_logprobs": top, "text_offset": []}

    async def embeddings(self, request):
        """/v1/embeddings: last-token pooled hidden states (reference
        serving_embedding.py). `input` is a string, token-id list, or list
        of either."""
        import asyncio

        body = await request.json()
        inputs = self._encode_prompts({"prompt": body.get("input")})

        async def one(i, token_ids):
            rid = next(self._request_counter)
            from qspec_tpu.sampling_params import SamplingParams as SP
            final = None
            async for out in self.engine.generate(token_ids, SP(max_tokens=1),
                                                  request_id=rid, task="embed"):
                final = out
            return {"object": "embedding", "index": i,
                    "embedding": [float(x) for x in final.embedding]}

        data = await asyncio.gather(*(one(i, t) for i, t in enumerate(inputs)))
        return web.json_response({
            "object": "list", "data": list(data), "model": self.model_name,
            "usage": {"prompt_tokens": sum(len(t) for t in inputs),
                      "total_tokens": sum(len(t) for t in inputs)},
        })

    async def score(self, request):
        """/v1/score (reference serving_score.py): relevance of text_2
        item(s) to text_1. With a cross-encoder checkpoint
        (params["score_head"], reference cross-encoder model class
        models/registry.py:142-150) each pair is encoded JOINTLY through
        the trunk and scored by the classification head — the reference's
        true cross-encoding semantics. Embedding-only checkpoints fall
        back to bi-encoder cosine with the same response shape."""
        import asyncio
        import math

        body = await request.json()
        t1 = body.get("text_1")
        t2 = body.get("text_2")
        if t1 is None or t2 is None:
            raise web.HTTPBadRequest(reason="text_1 and text_2 are required")
        t2_list = t2 if isinstance(t2, list) else [t2]

        def toks_of(text):
            return (self.tokenizer.encode(text)
                    if isinstance(text, str) else list(text))

        async def emb(token_ids):
            rid = next(self._request_counter)
            from qspec_tpu.sampling_params import SamplingParams as SP
            final = None
            async for out in self.engine.generate(token_ids,
                                                  SP(max_tokens=1),
                                                  request_id=rid,
                                                  task="embed"):
                final = out
            return final.embedding

        head = self.engine.engine.runner.params.get("score_head")
        if head is not None:
            from qspec_tpu.entrypoints.llm import cross_encoder_score
            t1_ids = toks_of(t1)
            pairs = [t1_ids + toks_of(t) for t in t2_list]
            pooled = await asyncio.gather(*(emb(p) for p in pairs))
            data = [{"object": "score", "index": i,
                     "score": cross_encoder_score(head, e)}
                    for i, e in enumerate(pooled)]
            toks = sum(len(p) for p in pairs)
            return web.json_response({
                "id": f"score-{uuid.uuid4().hex[:24]}", "object": "list",
                "model": self.model_name, "data": data,
                "usage": {"prompt_tokens": toks, "total_tokens": toks},
            })

        all_ids = [toks_of(t1)] + [toks_of(t) for t in t2_list]
        results = await asyncio.gather(*(emb(ids) for ids in all_ids))
        e1, rest = results[0], results[1:]

        def cos(a, b):
            num = sum(float(x) * float(y) for x, y in zip(a, b))
            da = math.sqrt(sum(float(x) ** 2 for x in a))
            db = math.sqrt(sum(float(y) ** 2 for y in b))
            return num / max(da * db, 1e-9)

        data = [{"object": "score", "index": i, "score": cos(e1, e)}
                for i, e in enumerate(rest)]
        toks = sum(len(ids) for ids in all_ids)
        return web.json_response({
            "id": f"score-{uuid.uuid4().hex[:24]}", "object": "list",
            "model": self.model_name, "data": data,
            "usage": {"prompt_tokens": toks, "total_tokens": toks},
        })

    @staticmethod
    def _nth_sp(sp, j):
        """Per-choice sampling params for n>1: distinct seeds when seeded,
        otherwise shared (each request draws fresh engine randomness)."""
        if j == 0 or sp.seed is None:
            return sp
        import dataclasses
        return dataclasses.replace(sp, seed=sp.seed + j)

    async def _generate_one(self, token_ids, sp, mm_images=None,
                            image_token_id=None, lora_name=None):
        rid = next(self._request_counter)
        final = None
        kw = {}
        if mm_images:
            kw = {"mm_images": mm_images, "image_token_id": image_token_id}
        if lora_name:
            kw["lora_name"] = lora_name
        async for out in self.engine.generate(token_ids, sp, request_id=rid,
                                              **kw):
            final = out
        return final

    async def completions(self, request):
        import asyncio

        body = await request.json()
        prompts = self._encode_prompts(body)
        sp = self._sampling(body)
        n = max(1, int(body.get("n", 1)))
        cid = f"cmpl-{uuid.uuid4().hex[:24]}"

        if body.get("stream"):
            if len(prompts) > 1 or n > 1:
                raise web.HTTPBadRequest(
                    reason="streaming supports a single prompt with n=1")
            rid = next(self._request_counter)
            return await self._stream(request, prompts[0], sp, rid, cid,
                                      chat=False)

        # n>1 fans out n engine requests per prompt; prefix caching shares
        # the prompt KV between them (the reference's v1 n>1 semantics —
        # independent samples, not beams). All choices run concurrently.
        jobs = [(i * n + j, token_ids, self._nth_sp(sp, j))
                for i, token_ids in enumerate(prompts) for j in range(n)]
        lname = self._lora_name_of(body)
        finals = await asyncio.gather(
            *(self._generate_one(t, s, lora_name=lname) for _, t, s in jobs))
        choices, p_toks, c_toks = [], 0, 0
        for (idx, token_ids, _), final in zip(jobs, finals):
            text = final.text or (self.tokenizer.decode(final.output_token_ids)
                                  if self.tokenizer else "")
            choices.append({"index": idx, "text": text,
                            "logprobs": self._logprobs_payload(final, sp.logprobs),
                            "finish_reason": final.finish_reason})
            c_toks += len(final.output_token_ids)
        p_toks = sum(len(t) for t in prompts)
        return web.json_response({
            "id": cid, "object": "text_completion", "created": _now(),
            "model": self.model_name,
            "choices": choices,
            "usage": {"prompt_tokens": p_toks, "completion_tokens": c_toks,
                      "total_tokens": p_toks + c_toks},
        })

    @staticmethod
    def _decode_data_url(url: str):
        """data: URL (base64 png/jpeg) -> float image [H, W, 3] in [0, 1].
        Only inline data URLs are accepted — the serving host has no
        egress; remote http(s) image URLs are rejected explicitly."""
        import base64
        import io

        if not url.startswith("data:"):
            raise web.HTTPBadRequest(
                reason="only data: image URLs are supported")
        b64 = url.split(",", 1)[1]
        raw = base64.b64decode(b64)
        from PIL import Image
        import numpy as np
        img = Image.open(io.BytesIO(raw)).convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    def _flatten_mm_messages(self, messages):
        """OpenAI list-content messages -> (text messages, images): each
        image_url part becomes an <image> placeholder in the text
        (reference: chat_utils.parse_chat_messages multimodal path)."""
        images = []
        out = []
        for m in messages:
            c = m.get("content")
            if isinstance(c, list):
                parts = []
                for part in c:
                    if part.get("type") == "image_url":
                        images.append(self._decode_data_url(
                            part["image_url"]["url"]))
                        parts.append("<image>")
                    elif part.get("type") == "text":
                        parts.append(part["text"])
                out.append({**m, "content": "".join(parts)})
            else:
                out.append(m)
        return out, images

    def _tool_tokenize(self, messages, tools, tool_choice, sp):
        """Tool-calling setup (reference: serving_chat.py + tool_parsers/):
        render the tool specs through the tokenizer's native `tools=` chat
        template when it has one, else inject the canonical-format system
        message; for forced tool choice ("required" or a named function),
        constrain generation with the grammar-guided JSON FSM so the call
        parses by construction."""
        from qspec_tpu.entrypoints.openai.tool_parser import (
            forced_call_schema, tools_system_message)
        forced = None
        if tool_choice == "required":
            forced = forced_call_schema(tools)
        elif isinstance(tool_choice, dict):
            name = tool_choice.get("function", {}).get("name")
            forced = forced_call_schema(tools, name)
        if forced is not None:
            sp.guided_json = forced
        # POSITIVE tools-support detection: a chat template that doesn't use
        # `tools` silently DROPS the kwarg (Jinja ignores unused variables —
        # no TypeError), so exception-based detection would leave the model
        # blind to the tool definitions. Check the template source, and fall
        # back to comparing renders with/without tools.
        native = False
        tmpl = getattr(self.tokenizer, "chat_template", None)
        if tmpl is not None and "tools" in str(tmpl):
            native = True
        else:
            try:
                with_tools = self.tokenizer.apply_chat_template(
                    messages, tools=tools, tokenize=True,
                    add_generation_prompt=True)
                without = self.tokenizer.apply_chat_template(
                    messages, tokenize=True, add_generation_prompt=True)
                native = with_tools != without
            except (TypeError, ValueError):
                native = False
        if native:
            token_ids = self.tokenizer.apply_chat_template(
                messages, tools=tools, tokenize=True,
                add_generation_prompt=True)
        else:
            token_ids = self.tokenizer.apply_chat_template(
                [tools_system_message(tools)] + list(messages),
                tokenize=True, add_generation_prompt=True)
        return token_ids, forced is not None

    async def chat_completions(self, request):
        import asyncio

        body = await request.json()
        messages, images = self._flatten_mm_messages(body["messages"])
        image_token_id = None
        if images:
            image_token_id = self.tokenizer.convert_tokens_to_ids("<image>")
            if image_token_id is None or image_token_id < 0 or \
                    image_token_id == getattr(self.tokenizer,
                                              "unk_token_id", -1):
                raise web.HTTPBadRequest(
                    reason="tokenizer has no <image> token; serve a "
                           "multimodal-ready tokenizer")
        sp = self._sampling(body)
        tools = body.get("tools")
        tool_choice = body.get("tool_choice", "auto" if tools else "none")
        want_tools = bool(tools) and tool_choice != "none"
        forced_tool = False
        if want_tools:
            try:
                token_ids, forced_tool = self._tool_tokenize(
                    messages, tools, tool_choice, sp)
            except ValueError as e:
                # unknown tool_choice name / unsupported JSON-schema feature
                # in a tool's parameters: a client error, not a 500
                raise web.HTTPBadRequest(reason=str(e))
        else:
            token_ids = self.tokenizer.apply_chat_template(
                messages, tokenize=True, add_generation_prompt=True)
        tool_names = [t.get("function", t).get("name")
                      for t in (tools or ())]
        n = max(1, int(body.get("n", 1)))
        cid = f"chatcmpl-{uuid.uuid4().hex[:24]}"

        if body.get("stream"):
            if n > 1:
                raise web.HTTPBadRequest(reason="streaming supports n=1")
            if images:
                raise web.HTTPBadRequest(
                    reason="streaming with images is not supported")
            rid = next(self._request_counter)
            return await self._stream(request, token_ids, sp, rid, cid,
                                      chat=True,
                                      tool_names=tool_names
                                      if want_tools else None)

        try:
            finals = await asyncio.gather(
                *(self._generate_one(token_ids, self._nth_sp(sp, j),
                                     mm_images=images,
                                     image_token_id=image_token_id)
                  for j in range(n)))
        except ValueError as e:
            # grammar compilation of guided options happens in add_request
            raise web.HTTPBadRequest(reason=str(e))
        choices = []
        for j, final in enumerate(finals):
            text = final.text or self.tokenizer.decode(final.output_token_ids)
            msg = {"role": "assistant", "content": text}
            finish = final.finish_reason
            if want_tools:
                from qspec_tpu.entrypoints.openai.tool_parser import (
                    parse_tool_calls)
                content, calls = parse_tool_calls(text, tool_names)
                if forced_tool and not calls:
                    # guided decoding guarantees parseable JSON, but a
                    # max_tokens cutoff can truncate it mid-call
                    raise web.HTTPBadRequest(
                        reason="forced tool call truncated; raise max_tokens")
                if calls:
                    msg = {"role": "assistant", "content": content,
                           "tool_calls": calls}
                    finish = "tool_calls"
            choices.append({"index": j, "message": msg,
                            "logprobs": self._logprobs_payload(final, sp.logprobs),
                            "finish_reason": finish})
        c_toks = sum(len(f.output_token_ids) for f in finals)
        return web.json_response({
            "id": cid, "object": "chat.completion", "created": _now(),
            "model": self.model_name,
            "choices": choices,
            "usage": {"prompt_tokens": len(token_ids),
                      "completion_tokens": c_toks,
                      "total_tokens": len(token_ids) + c_toks},
        })

    async def _stream(self, request, token_ids, sp, rid, cid, chat: bool,
                      tool_names=None):
        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream",
                                           "Cache-Control": "no-cache"})
        await resp.prepare(request)
        # incremental detokenization (reference detokenize_incrementally):
        # decoding each token-id delta independently would split multi-byte
        # characters at chunk boundaries into U+FFFD mojibake
        from qspec_tpu.detokenizer import DetokState, detokenize_incrementally
        detok = DetokState()
        # streaming tool-call extraction (reference hermes_tool_parser
        # streaming path): content streams through, completed tool blocks
        # become tool_calls deltas
        parser = None
        if chat and tool_names is not None:
            from qspec_tpu.entrypoints.openai.tool_parser import (
                StreamingToolParser)
            parser = StreamingToolParser(tool_names)
        emitted = 0

        async def write_chunk(delta, finish=None):
            if chat:
                payload = {"id": cid, "object": "chat.completion.chunk",
                           "created": _now(), "model": self.model_name,
                           "choices": [{"index": 0, "delta": delta,
                                        "finish_reason": finish}]}
            else:
                payload = {"id": cid, "object": "text_completion",
                           "created": _now(), "model": self.model_name,
                           "choices": [{"index": 0,
                                        "text": delta.get("content", ""),
                                        "finish_reason": finish}]}
            await resp.write(f"data: {json.dumps(payload)}\n\n".encode())

        async for out in self.engine.generate(token_ids, sp, request_id=rid):
            if self.tokenizer is not None:
                text = detokenize_incrementally(
                    self.tokenizer, out.output_token_ids, detok)
                delta_text, emitted = text[emitted:], len(text)
            else:
                delta_text = ""
            if parser is not None:
                deltas = parser.push(delta_text)
                if out.finished:
                    deltas += parser.finish()
                for d in deltas:
                    await write_chunk(d)
                if out.finished:
                    finish = ("tool_calls" if parser.n_calls
                              else out.finish_reason)
                    await write_chunk({}, finish)
                continue
            if not delta_text and not out.finished:
                continue
            await write_chunk({"content": delta_text},
                              out.finish_reason if out.finished else None)
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp


def build_server(args: EngineArgs, model_name: Optional[str] = None,
                 params=None, tokenizer=None):
    from qspec_tpu.entrypoints.llm import LLM

    llm = LLM(model=args.model or "tiny", params=params, tokenizer=tokenizer,
              quantization=args.quantization,
              max_model_len=args.max_model_len, max_num_seqs=args.max_num_seqs,
              num_speculative_tokens=args.num_speculative_tokens)
    async_engine = AsyncLLMEngine(llm.llm_engine)
    return OpenAIServer(async_engine, model_name or args.model or "qspec-tpu",
                        llm.tokenizer)


def main(argv=None):
    parser = argparse.ArgumentParser("qspec_tpu OpenAI-compatible server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    EngineArgs.add_cli_args(parser)
    args = parser.parse_args(argv)
    server = build_server(EngineArgs.from_cli_args(args))
    web.run_app(server.app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
