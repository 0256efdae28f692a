"""Offline inference API (reference: vllm/entrypoints/llm.py:49 `LLM`).

    from qspec_tpu import LLM, SamplingParams
    llm = LLM(model="llama3-8b", num_speculative_tokens=3)
    outs = llm.generate(["Hello"], SamplingParams(max_tokens=64))
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from qspec_tpu.engine.arg_utils import EngineArgs
from qspec_tpu.engine.llm_engine import LLMEngine, RequestOutput
from qspec_tpu.sampling_params import SamplingParams


def cross_encoder_score(head, pooled) -> float:
    """Sequence-classification / reward head over a pooled hidden state
    (reference cross-encoder pooling, serving_score.py; two-layer reward
    stacks per models/qwen2_rm.py): sigmoid for a 1-logit head,
    probability of the last label for a softmax head."""
    import math

    import numpy as np
    pooled = np.asarray(pooled, np.float32)
    if "w1" in head:
        h = pooled @ np.asarray(head["w1"], np.float32)
        if "b1" in head:
            h = h + np.asarray(head["b1"], np.float32)
        act = int(np.asarray(head.get("act", 0)))
        pooled = np.tanh(h) if act == 1 else np.maximum(h, 0.0)
    w = np.asarray(head["w"], np.float32)
    logits = pooled @ w
    if "b" in head:
        logits = logits + np.asarray(head["b"], np.float32)
    if logits.shape[-1] == 1:
        return float(1.0 / (1.0 + math.exp(-float(logits[0]))))
    e = np.exp(logits - logits.max())
    return float((e / e.sum())[-1])


class LLM:
    def __init__(self, model: str = "tiny", params=None, mesh=None,
                 tokenizer=None, seed: int = 0, draft_model: Optional[str] = None,
                 draft_params=None, **engine_kwargs):
        args = EngineArgs(model=model, **engine_kwargs)
        self.engine_config = args.create_engine_config()
        cfg = self.engine_config.model
        # reference --speculative-model <dir>: a separate draft checkpoint.
        # A .npz path serves trained Medusa heads or an EAGLE draft net
        # (key-sniffed: medusa saves w1/b1/head, eagle saves fc/layers.*)
        spec_net_path = None
        if draft_model is None and args.speculative_model:
            import os as _os
            if _os.path.isdir(args.speculative_model):
                draft_model = args.speculative_model
            elif args.speculative_model.endswith(".npz"):
                spec_net_path = args.speculative_model

        self.tokenizer = tokenizer
        eos = None
        if tokenizer is None and model not in ("tiny", "llama3-8b", "llama3-70b",
                                               "qwen2-7b", ""):
            try:
                import transformers
                self.tokenizer = transformers.AutoTokenizer.from_pretrained(model)
            except Exception:
                self.tokenizer = None
        if self.tokenizer is not None:
            eos = getattr(self.tokenizer, "eos_token_id", None)

        if params is None:
            import os
            if os.path.isdir(model):
                from qspec_tpu.model_loader.checkpoint import (is_qspec_checkpoint,
                                                               load_checkpoint)
                from qspec_tpu.model_loader.loader import (load_hf_float,
                                                           load_qspec, quantize_float)
                # HF quantization_config routing (reference: vllm
                # get_quantization_config): AWQ/GPTQ checkpoints ingest
                # through the grouped-int4 loader
                qmethod = None
                try:
                    import json as _json
                    with open(os.path.join(model, "config.json")) as f:
                        qmethod = (_json.load(f).get("quantization_config")
                                   or {}).get("quant_method")
                except Exception:
                    pass
                if is_qspec_checkpoint(model):
                    params, cfg = load_checkpoint(model)
                elif qmethod in ("awq", "gptq"):
                    from qspec_tpu.model_loader.grouped import (load_awq,
                                                                load_gptq)
                    load_g = load_awq if qmethod == "awq" else load_gptq
                    params, cfg = load_g(model, cfg)
                elif qmethod == "compressed-tensors":
                    from qspec_tpu.model_loader.ct import \
                        load_compressed_tensors
                    with open(os.path.join(model, "config.json")) as f:
                        qcfg = _json.load(f).get("quantization_config") or {}
                    params, cfg = load_compressed_tensors(model, cfg,
                                                          qconfig=qcfg)
                elif cfg.quant == "w4":
                    try:
                        params, cfg = load_qspec(model, cfg)
                    except KeyError:  # float checkpoint: quantize offline
                        params, cfg = quantize_float(model, cfg)
                else:
                    from qspec_tpu.model_loader.families import (
                        CONVERTERS, load_family_float)
                    if cfg.arch in CONVERTERS:
                        # non-llama checkpoint layouts (OPT/GPT-2/
                        # starcoder2/falcon/baichuan/internlm2/deepseek)
                        from qspec_tpu.model_loader.loader import (
                            _read_safetensors)
                        params, cfg = load_family_float(
                            _read_safetensors(model), cfg)
                    else:
                        params, cfg = load_hf_float(model, cfg)
                self.engine_config = self.engine_config.__class__(
                    **{**self.engine_config.__dict__, "model": cfg})
            else:
                from qspec_tpu.models.llama import init_params_device
                params = init_params_device(cfg, seed=seed)

        if draft_model is not None and draft_params is None:
            # separate draft checkpoint (reference speculative_model=<path>):
            # load it and record its config in the speculative section
            import dataclasses
            import os
            from qspec_tpu.model_loader.loader import (config_from_hf_dir,
                                                       load_hf_float,
                                                       quantize_float)
            assert os.path.isdir(draft_model), draft_model
            dcfg = config_from_hf_dir(draft_model)
            if dcfg.quant == "w4":
                draft_params, dcfg = quantize_float(draft_model, dcfg)
            else:
                draft_params, dcfg = load_hf_float(draft_model, dcfg)
            spec = self.engine_config.speculative
            assert spec is not None, "draft_model requires speculative config"
            self.engine_config = dataclasses.replace(
                self.engine_config,
                speculative=dataclasses.replace(spec, draft_model=dcfg))

        if spec_net_path is not None:
            import dataclasses
            with __import__("numpy").load(spec_net_path) as z:
                is_medusa = "w1" in z.files
                is_mlp_spec = "proj_first" in z.files
            spec = self.engine_config.speculative
            assert spec is not None, \
                "--speculative-model <net.npz> requires num_speculative_tokens"
            if is_medusa:
                from qspec_tpu.spec_decode.medusa import load_medusa
                params = {**params, "medusa": load_medusa(spec_net_path)}
                method = "medusa"
            elif is_mlp_spec:
                from qspec_tpu.spec_decode.mlp_speculator import (
                    load_mlp_speculator)
                params = {**params,
                          "mlp_spec": load_mlp_speculator(spec_net_path)}
                method = "mlp_speculator"
            else:
                from qspec_tpu.spec_decode.eagle import load_eagle
                params = {**params,
                          "eagle": load_eagle(spec_net_path, cfg)}
                method = "eagle"
            self.engine_config = dataclasses.replace(
                self.engine_config,
                speculative=dataclasses.replace(spec, method=method))

        self.llm_engine = LLMEngine(self.engine_config, params, eos_token_id=eos,
                                    tokenizer=self.tokenizer, mesh=mesh,
                                    draft_params=draft_params)

    # ------------------------------------------------------------------
    def _encode(self, prompt: Union[str, List[int]]) -> List[int]:
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string prompts need a tokenizer")
            return self.tokenizer.encode(prompt)
        return list(prompt)

    def generate(self, prompts: Sequence[Union[str, List[int], dict]],
                 sampling_params: Optional[Union[SamplingParams,
                                                 List[SamplingParams]]] = None,
                 ) -> List[RequestOutput]:
        """Each prompt may be a string, token-id list, or a dict with any of
        ``prompt`` / ``prompt_token_ids`` / ``prompt_embeds`` /
        ``multi_modal_data`` ({"image": array or [arrays]}, plus
        ``image_token_id``) — the reference's inputs-pipeline prompt forms
        (vllm/inputs/data.py TextPrompt/TokensPrompt/EmbedsPrompt)."""
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)
        ids = []
        for p, sp in zip(prompts, sampling_params):
            if isinstance(p, dict):
                toks = (list(p["prompt_token_ids"])
                        if p.get("prompt_token_ids") is not None
                        else self._encode(p["prompt"]) if p.get("prompt")
                        else None)
                mm = p.get("multi_modal_data") or {}
                imgs = mm.get("image")
                if imgs is not None and not isinstance(imgs, (list, tuple)):
                    imgs = [imgs]
                tid = p.get("image_token_id")
                if imgs is not None and tid is None:
                    tid = self._image_token_id()
                ids.append(self.llm_engine.add_request(
                    toks, sp, prompt_embeds=p.get("prompt_embeds"),
                    mm_images=imgs, image_token_id=tid))
            else:
                ids.append(self.llm_engine.add_request(self._encode(p), sp))
        results = {}
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                if out.finished:
                    results[out.request_id] = out
        return [results[i] for i in ids]

    def _image_token_id(self) -> int:
        mc = self.llm_engine.config.model
        if mc.image_token_id is not None:
            # VLM configs carry it (HF image_token_index via the registry)
            return mc.image_token_id
        tok = self.tokenizer
        if tok is not None:
            for name in ("<image>", "<|image|>"):
                tid = tok.convert_tokens_to_ids(name) \
                    if hasattr(tok, "convert_tokens_to_ids") else None
                if tid is not None and tid >= 0:
                    return tid
        raise ValueError("pass image_token_id (no tokenizer image token)")

    def embed(self, prompts: Sequence[Union[str, List[int]]]) -> List:
        """Pooled (last-token, post-final-norm) hidden-state embeddings
        (reference LLM.encode / pooling-model path). Returns one float32
        vector of size hidden_size per prompt."""
        ids = [self.llm_engine.add_request(self._encode(p), SamplingParams(
            max_tokens=1), task="embed") for p in prompts]
        results = {}
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                if out.finished:
                    results[out.request_id] = out
        return [results[i].embedding for i in ids]

    def score(self, text_1, text_2s: Sequence) -> List[float]:
        """Relevance of each text_2 to text_1 (reference LLM.score /
        serving_score.py). With a cross-encoder checkpoint
        (ModelConfig.num_labels > 0 -> params["score_head"], the reference's
        cross-encoder model class, models/registry.py:142-150) each
        (text_1, text_2) pair is encoded JOINTLY through the trunk and the
        classification head maps the pooled hidden to a score (sigmoid for
        num_labels == 1, last-label softmax otherwise). Without a head the
        score falls back to bi-encoder cosine over pooled embeddings."""
        head = self.llm_engine.runner.params.get("score_head")
        if head is None:
            import math
            embs = self.embed([text_1] + list(text_2s))
            e1, rest = embs[0], embs[1:]

            def cos(a, b):
                num = sum(float(x) * float(y) for x, y in zip(a, b))
                da = math.sqrt(sum(float(x) ** 2 for x in a))
                db = math.sqrt(sum(float(y) ** 2 for y in b))
                return num / max(da * db, 1e-9)

            return [cos(e1, e) for e in rest]
        t1 = self._encode(text_1)
        pairs = [t1 + self._encode(t2) for t2 in text_2s]
        pooled = self.embed(pairs)
        return [cross_encoder_score(head, e) for e in pooled]

    def beam_search(self, prompts: Sequence[Union[str, List[int]]],
                    params=None):
        """Deterministic beam search (reference LLM.beam_search,
        vllm/entrypoints/llm.py:507). Returns one BeamSearchOutput per
        prompt with beam_width sequences, best-first."""
        from qspec_tpu.beam_search import BeamSearchParams, beam_search
        if params is None:
            params = BeamSearchParams()
        ids = [self._encode(p) for p in prompts]
        return beam_search(self.llm_engine, ids, params)

    def chat(self, messages, sampling_params: Optional[SamplingParams] = None,
             chat_template: Optional[str] = None) -> List[RequestOutput]:
        """messages: list of conversations (each a list of {role, content}).

        Uses the tokenizer's chat template when available; otherwise falls
        back to a named template from qspec_tpu.conversation (the reference's
        fastchat-style templates, vllm/conversation.py).
        """
        if self.tokenizer is None:
            raise ValueError("chat needs a tokenizer")
        if messages and isinstance(messages[0], dict):
            messages = [messages]
        if chat_template is None and hasattr(self.tokenizer, "apply_chat_template"):
            try:
                prompts = [self.tokenizer.apply_chat_template(
                    m, tokenize=True, add_generation_prompt=True)
                    for m in messages]
                return self.generate(prompts, sampling_params)
            except Exception:
                pass
        from qspec_tpu.conversation import get_conv_template
        conv_name = chat_template or "llama-3"
        prompts = []
        for m in messages:
            conv = get_conv_template(conv_name)
            for msg in m:
                if msg["role"] == "system":
                    conv.system_message = msg["content"]
                else:
                    conv.append_message(msg["role"], msg["content"])
            conv.append_message(conv.roles[1], None)
            prompts.append(self.tokenizer.encode(conv.get_prompt()))
        return self.generate(prompts, sampling_params)

    @property
    def spec_metrics(self):
        return self.llm_engine.spec_metrics
