"""Medusa-style multi-token proposal heads.

TPU-native redesign of the reference's Medusa proposer
(/root/reference/vllm/spec_decode/medusa_worker.py +
vllm/model_executor/models/medusa.py): K residual-block heads read the
target model's LAST hidden state and each predicts one future position
(head j proposes the token at offset j+1 past the next token). Where the
reference runs the heads in a separate worker process with its own model
object, here the heads are a small subtree of the target's param pytree
(``params["medusa"]``) and the proposal math rides INSIDE the fused
verify executable (engine/model_runner.py medusa_rounds_step): the hidden
state that seeds round r+1's proposals is a by-product of round r's verify
pass, so drafting costs zero extra forward passes — the TPU shape of
Medusa's "one forward, k proposals" property.

Head structure (reference medusa.py ResidualBlock):

    r      = h + silu(h @ w1 + b1)          # residual block
    logits = r @ head                       # per-head vocab projection
    proposal = argmax(logits)               # top-1, like Top1Proposer

For QuaRot checkpoints the residual stream lives in the rotated basis
(model_loader.quantize_float rotates by Q = random_hadamard(H)); heads are
TRAINED directly on the rotated, final-rmsnorm'd hidden (see
benchmarks/train_medusa.py), so no basis fix-up is needed at load time.

Proposals verify through the one-hot rejection path (ops/sampling.py), so
greedy spec == greedy AR holds exactly (a proposal is emitted iff it equals
the target's argmax), and stochastic sampling stays lossless by the
rejection-sampling identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def medusa_propose(medusa: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """Greedy proposals from the K heads.

    medusa: {"w1": [K, H, H], "b1": [K, H], "head": [K, H, V]} (bf16).
    hidden: [B, H] — the target's post-final-norm hidden state at the last
    accepted position. Returns proposals [B, K] int32 (head j's argmax =
    the token j+1 positions past the next token).
    """
    from qspec_tpu.ops._kernel_utils import backend_is_tpu
    # bf16 operands ride the MXU; the CPU test backend's eager dot thunk
    # lacks bf16xbf16=f32, so run f32 there
    cdt = jnp.bfloat16 if backend_is_tpu() else jnp.float32
    h = hidden.astype(cdt)
    z = jnp.einsum("bh,khg->bkg", h, medusa["w1"].astype(cdt),
                   preferred_element_type=jnp.float32)
    z = z + medusa["b1"][None].astype(jnp.float32)
    r = h[:, None].astype(jnp.float32) + jax.nn.silu(z)
    logits = jnp.einsum("bkg,kgv->bkv", r.astype(cdt),
                        medusa["head"].astype(cdt),
                        preferred_element_type=jnp.float32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def init_medusa_params(hidden_size: int, vocab_size: int, k: int,
                       seed: int = 0, dtype=jnp.bfloat16,
                       lm_head: np.ndarray = None) -> dict:
    """Random (or lm_head-seeded) Medusa heads; tests and training init.

    The reference initializes each head's vocab projection from the base
    lm_head (medusa trains only the heads); passing ``lm_head`` [H, V]
    replicates that and makes untrained heads propose the t+1 token —
    a sane starting point for the short-horizon heads.
    """
    rng = np.random.default_rng(seed)
    H, V = hidden_size, vocab_size
    if lm_head is not None:
        head = np.broadcast_to(np.asarray(lm_head, np.float32)[None],
                               (k, H, V)).copy()
    else:
        head = rng.standard_normal((k, H, V)).astype(np.float32) * 0.02
    return {
        # w1 == 0 disables the silu path at init => r == h (identity block)
        "w1": jnp.zeros((k, H, H), dtype),
        "b1": jnp.zeros((k, H), dtype),
        "head": jnp.asarray(head, dtype),
    }


def load_medusa(path: str, dtype=jnp.bfloat16) -> dict:
    """Load trained heads saved by benchmarks/train_medusa.py (.npz with
    stacked w1/b1/head arrays)."""
    with np.load(path) as z:
        return {"w1": jnp.asarray(z["w1"], dtype),
                "b1": jnp.asarray(z["b1"], dtype),
                "head": jnp.asarray(z["head"], dtype)}
