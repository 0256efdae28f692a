"""Native checkpoint save/load for quantized param pytrees.

TPU-native analogue of the reference's sharded-state save/load
(vllm/model_executor/model_loader/loader.py ShardedStateLoader +
examples/offline_inference/save_sharded_state.py): once a float checkpoint
has been rotated + quantized (model_loader.quantize_float — the expensive
offline step), persist the ready-to-serve pytree so later engines start
without redoing it. Uses orbax when available, with a plain numpy .npz
fallback.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from qspec_tpu.config import ModelConfig

_MANIFEST = "qspec_manifest.json"


def save_checkpoint(path: str, params, cfg: ModelConfig) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump({"model_config": cfg.__dict__, "format": "qspec_tpu.v1"}, f,
                  indent=2)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(os.path.join(path, "params")), params,
                   force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    flat, treedef = jax.tree.flatten(params)
    np.savez(os.path.join(path, "params.npz"),
             **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)})
    with open(os.path.join(path, "treedef.json"), "w") as f:
        json.dump(jax.tree_util.tree_structure(params).serialize_using_proto()
                  .hex() if hasattr(treedef, "serialize_using_proto") else "",
                  f)


def load_checkpoint(path: str) -> Tuple[dict, ModelConfig]:
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    cfg = ModelConfig(**manifest["model_config"])
    params_dir = os.path.join(path, "params")
    if os.path.isdir(params_dir):
        import orbax.checkpoint as ocp
        from qspec_tpu.models.llama import init_params
        # restore against an abstract target built from a tiny init of the
        # same config (shapes/dtypes derive from cfg deterministically)
        template = jax.eval_shape(lambda: init_params(cfg, seed=0))
        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(os.path.abspath(params_dir), template)
        return params, cfg
    data = np.load(os.path.join(path, "params.npz"))
    raise NotImplementedError("npz fallback restore requires orbax-free "
                              "treedef support; install orbax")


def is_qspec_checkpoint(path: str) -> bool:
    return os.path.exists(os.path.join(path, _MANIFEST))
