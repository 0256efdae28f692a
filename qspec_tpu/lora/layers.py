"""Multi-LoRA serving: per-request low-rank adapters over the shared base.

TPU-native analogue of the reference's LoRA stack (vllm/lora/: models.py
LRU-managed adapters, layers.py per-layer wrapping, punica_wrapper SGMV/BGMV
Triton kernels). The punica grouped-GEMV problem — "each token multiplies a
different adapter's A/B" — becomes two dense MXU matmuls with a mask:

    xa    = einsum('th,ahr->atr', x, A)          # all adapters' down-proj
    delta = (mask * xa)  reshaped [T, n*r]  @  B reshaped [n*r, out]

With n adapters of rank r, the extra FLOPs are T*(H + out)*n*r — noise next
to the base projection — and the shapes are static for every batch mix, so
one executable serves any adapter assignment (the reference needs custom
kernels for exactly this).

Slot 0 is the base model (zero adapter). Adapters live inside the param
pytree (params["lora"]) so the jitted step functions close over them like
any other weights; swapping an adapter slot is a functional param update.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

TARGETS = ("qkv", "o", "gate_up", "down")


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    max_loras: int = 4          # adapter slots incl. slot 0 = base/zero
    max_rank: int = 16


def _proj_dims(cfg):
    H, I = cfg.hidden_size, cfg.intermediate_size
    return {"qkv": (H, cfg.qkv_out), "o": (cfg.q_size, H),
            "gate_up": (H, 2 * I), "down": (I, H)}


def init_lora_params(cfg, lora_cfg: LoRAConfig, dtype=jnp.bfloat16):
    """Zero-initialized adapter pytree: per layer, per target,
    A [n, in, r] and B [n, r, out] (slot 0 and unused slots stay zero)."""
    n, r = lora_cfg.max_loras, lora_cfg.max_rank
    dims = _proj_dims(cfg)
    layers = {
        t: {"A": jnp.zeros((cfg.num_layers, n, i, r), dtype),
            "B": jnp.zeros((cfg.num_layers, n, r, o), dtype)}
        for t, (i, o) in dims.items()
    }
    return {"layers": layers}


def lora_delta(x: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray,
               ids: jnp.ndarray) -> jnp.ndarray:
    """x [T, in]; A [n, in, r]; B [n, r, out]; ids [T] -> delta [T, out]."""
    n, _, r = A.shape
    xa = jnp.einsum("th,ahr->atr", x.astype(jnp.float32), A.astype(jnp.float32),
                    preferred_element_type=jnp.float32)       # [n, T, r]
    mask = (ids[None, :] == jnp.arange(n)[:, None]).astype(jnp.float32)
    xa = xa * mask[:, :, None]
    T = x.shape[0]
    delta = jnp.dot(xa.transpose(1, 0, 2).reshape(T, n * r),
                    B.astype(jnp.float32).reshape(n * r, -1),
                    preferred_element_type=jnp.float32)
    return delta.astype(x.dtype)


def load_peft_adapter(lora_params, cfg, slot: int, state_dict: Dict[str, np.ndarray],
                      alpha: Optional[float] = None, rank: Optional[int] = None):
    """Install a PEFT-style adapter into `slot` of the lora pytree.

    state_dict keys follow PEFT naming, e.g.
    ``base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight``
    ([r, in]) and ``...lora_B.weight`` ([out, r]). The alpha/r scaling is
    folded into B. Missing projections stay zero. Returns the updated pytree.
    """
    def find(layer, proj, ab):
        for k, v in state_dict.items():
            if f"layers.{layer}." in k and f"{proj}." in k and f"lora_{ab}" in k:
                return np.asarray(v, np.float32)
        return None

    max_r = lora_params["layers"]["qkv"]["A"].shape[-1]
    out = lora_params
    dims = _proj_dims(cfg)
    for t in TARGETS:
        in_f, out_f = dims[t]
        if t == "qkv":
            parts = [("q_proj", 0, cfg.q_size), ("k_proj", cfg.q_size, cfg.kv_size),
                     ("v_proj", cfg.q_size + cfg.kv_size, cfg.kv_size)]
        elif t == "gate_up":
            parts = [("gate_proj", 0, cfg.intermediate_size),
                     ("up_proj", cfg.intermediate_size, cfg.intermediate_size)]
        else:
            parts = [({"o": "o_proj", "down": "down_proj"}[t], 0, out_f)]
        for li in range(cfg.num_layers):
            # parts of a fused projection get disjoint rank stripes, so
            # independent q/k/v (or gate/up) adapters compose exactly:
            # A = [A_q | A_k | A_v] along rank, B block-diagonal over parts
            A_new = np.zeros((in_f, max_r), np.float32)
            B_new = np.zeros((max_r, out_f), np.float32)
            r_off = 0
            found_any = False
            for name, off, width in parts:
                a = find(li, name, "A")
                b = find(li, name, "B")
                if a is None or b is None:
                    continue
                r = a.shape[0]
                assert r_off + r <= max_r, \
                    f"sum of part ranks exceeds max_rank {max_r}"
                scale = (alpha / r) if alpha else 1.0
                A_new[:, r_off:r_off + r] = a.T
                B_new[r_off:r_off + r, off:off + width] = b.T * scale
                r_off += r
                found_any = True
            if not found_any:
                continue
            out["layers"][t]["A"] = out["layers"][t]["A"].at[li, slot].set(
                jnp.asarray(A_new, out["layers"][t]["A"].dtype))
            out["layers"][t]["B"] = out["layers"][t]["B"].at[li, slot].set(
                jnp.asarray(B_new, out["layers"][t]["B"].dtype))
    return out
