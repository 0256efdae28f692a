"""Soft-prompt (prompt-tuning) adapters.

Reference: vllm/prompt_adapter/ (PromptAdapterRequest + worker manager,
~738 LoC) serving PEFT prompt-tuning checkpoints — a trained matrix of
`num_virtual_tokens` embedding rows prepended to every request's prompt.

TPU-native shape: the engine already serves arbitrary prompt-embedding
rows (Sequence.prompt_embeds -> model_forward input_embeds), so a soft
prompt is just [adapter rows | embed-table rows of the real prompt] with
placeholder token ids over the virtual positions — no model or kernel
changes, any quantization scheme, composes with LoRA and spec decode.
The manager below is the name -> rows registry with PEFT ingestion.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np


class PromptAdapterError(RuntimeError):
    pass


class PromptAdapterManager:
    """Named soft-prompt registry for an engine (LLMEngine.prompt_adapters).

    Unlike LoRA there is no fixed device bank to manage: the rows are
    host-side and enter the graph through the per-request prompt-embeds
    path, so load/unload are plain dict ops (the reference's LRU GPU
    cache exists because its adapters live in device tensors)."""

    def __init__(self, engine):
        self._engine = engine
        self._lock = threading.Lock()
        self._adapters: Dict[str, np.ndarray] = {}

    def load(self, name: str, embeddings: np.ndarray) -> int:
        """Register `embeddings` [n_virtual, hidden] under `name`;
        returns the virtual token count."""
        emb = np.asarray(embeddings, np.float32)
        H = self._engine.config.model.hidden_size
        if emb.ndim != 2 or emb.shape[1] != H:
            raise PromptAdapterError(
                f"prompt adapter must be [n, {H}], got {emb.shape}")
        with self._lock:
            self._adapters[name] = emb
        return emb.shape[0]

    def load_path(self, name: str, path: str) -> int:
        """Load a PEFT prompt-tuning checkpoint (adapter_model
        .safetensors/.npz/.bin with key 'prompt_embeddings')."""
        import os
        if os.path.isdir(path):
            for fn in ("adapter_model.safetensors", "adapter_model.npz",
                       "adapter_model.bin"):
                p = os.path.join(path, fn)
                if os.path.exists(p):
                    path = p
                    break
        if path.endswith(".npz"):
            sd = dict(np.load(path))
        elif path.endswith(".safetensors"):
            from qspec_tpu.model_loader.loader import _read_safetensors
            sd = _read_safetensors(path)
        else:
            raise PromptAdapterError(f"unsupported adapter format: {path}")
        key = next((k for k in sd if "prompt_embeddings" in k
                    or k == "embedding.weight"), None)
        if key is None:
            raise PromptAdapterError(
                f"no prompt_embeddings tensor in {path} (keys: {sorted(sd)})")
        return self.load(name, sd[key])

    def unload(self, name: str) -> None:
        with self._lock:
            if self._adapters.pop(name, None) is None:
                raise PromptAdapterError(f"adapter {name!r} not loaded")

    def list_adapters(self) -> List[dict]:
        with self._lock:
            return [{"name": n, "virtual_tokens": int(a.shape[0])}
                    for n, a in sorted(self._adapters.items())]

    def get(self, name: str) -> np.ndarray:
        with self._lock:
            a = self._adapters.get(name)
        if a is None:
            raise PromptAdapterError(
                f"prompt adapter {name!r} not loaded "
                f"(loaded: {[x['name'] for x in self.list_adapters()]})")
        return a

    def splice(self, name: Optional[str], prompt_token_ids: List[int],
               params) -> tuple:
        """-> (token_ids, prompt_embeds) with the adapter rows prepended.

        Virtual positions carry token id 0 (never looked up — the embeds
        rows cover the whole prompt); real positions take their
        embed-table rows so the transcript stays faithful."""
        import jax
        rows = self.get(name)
        cfg = self._engine.config.model
        table = np.asarray(jax.device_get(params["embed"]), np.float32)
        scale = cfg.embed_scale if cfg.embed_scale is not None else 1.0
        real = table[np.asarray(prompt_token_ids, np.int32)] * scale
        embeds = np.concatenate([rows, real], axis=0)
        ids = [0] * rows.shape[0] + list(prompt_token_ids)
        return ids, embeds
