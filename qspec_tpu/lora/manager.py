"""Runtime LoRA adapter lifecycle: load / unload / LRU-evict without
recompiling.

TPU-native analogue of the reference's dynamic adapter stack
(vllm/lora/models.py LRUCacheLoRAModelManager + worker_manager.py,
served by the /v1/load_lora_adapter / /v1/unload_lora_adapter endpoints):
adapters live in the FIXED-SHAPE slot bank (lora/layers.init_lora_params,
params["lora"]["layers"][target]["A"|"B"][layer, slot]) that every jitted
step function already takes as a traced argument — so installing or
evicting an adapter is a functional `.at[slot].set(...)` param update, no
recompilation, no new executables. The reference needs GPU LRU paging of
punica buffers for exactly this; here the bank IS device-resident and the
manager only decides which named adapter owns which slot.

Slot 0 is the base model (zero adapter) and is never allocated.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

import numpy as np


class LoRASlotError(RuntimeError):
    pass


class LoRAManager:
    """Owns the name -> slot mapping over an engine's adapter bank.

    The engine exposes this as LLMEngine.lora (None when the model was
    built without a bank). Thread-safe: the OpenAI server's load/unload
    endpoints may race generate steps.
    """

    def __init__(self, engine):
        self._engine = engine
        self._lock = threading.RLock()
        runner = engine.runner
        if "lora" not in runner.params:
            raise LoRASlotError(
                "engine has no adapter bank: pass params['lora'] = "
                "init_lora_params(cfg, LoRAConfig(...)) at engine build")
        bank = runner.params["lora"]["layers"]
        self.max_slots = int(next(iter(bank.values()))["A"].shape[1])
        self.max_rank = int(next(iter(bank.values()))["A"].shape[-1])
        # name -> {"slot": int, "loaded_at": ts, "last_used": ts}
        self._adapters: Dict[str, dict] = {}

    # ---- queries ------------------------------------------------------
    def list_adapters(self) -> List[dict]:
        with self._lock:
            return [{"name": n, "slot": a["slot"],
                     "loaded_at": a["loaded_at"],
                     "last_used": a["last_used"]}
                    for n, a in sorted(self._adapters.items(),
                                       key=lambda kv: kv[1]["slot"])]

    def slot_of(self, name: Optional[str]) -> int:
        """Resolve an adapter name for a request (0/None = base). Bumps
        the LRU clock."""
        if not name:
            return 0
        with self._lock:
            a = self._adapters.get(name)
            if a is None:
                raise LoRASlotError(f"adapter {name!r} not loaded "
                                    f"(loaded: {sorted(self._adapters)})")
            a["last_used"] = time.time()
            return a["slot"]

    # ---- lifecycle ----------------------------------------------------
    def load(self, name: str, state_dict: Dict[str, np.ndarray], *,
             alpha: Optional[float] = None) -> int:
        """Install a PEFT-style adapter under `name`; returns its slot.

        Re-loading an existing name overwrites its slot in place. When
        the bank is full, the least-recently-used adapter NOT referenced
        by any running sequence is evicted (reference:
        LRUCacheLoRAModelManager.activate_adapter).
        """
        from qspec_tpu.lora.layers import load_peft_adapter

        with self._lock:
            if name in self._adapters:
                slot = self._adapters[name]["slot"]
            else:
                slot = self._free_slot()
            cfg = self._engine.config.model
            runner = self._engine.runner
            lora = self._clear_slot(runner.params["lora"], slot)
            runner.params["lora"] = load_peft_adapter(
                lora, cfg, slot, state_dict, alpha=alpha)
            now = time.time()
            self._adapters[name] = {"slot": slot, "loaded_at": now,
                                    "last_used": now}
            return slot

    def load_path(self, name: str, path: str, *,
                  alpha: Optional[float] = None) -> int:
        """Load from a PEFT checkpoint dir/file (.npz or .safetensors)."""
        import os
        sd = None
        if os.path.isdir(path):
            for fn in ("adapter_model.safetensors", "adapter_model.npz",
                       "adapter_model.bin"):
                p = os.path.join(path, fn)
                if os.path.exists(p):
                    path = p
                    break
            cfg_p = os.path.join(os.path.dirname(path),
                                 "adapter_config.json")
            if alpha is None and os.path.exists(cfg_p):
                import json
                with open(cfg_p) as f:
                    alpha = json.load(f).get("lora_alpha")
        if path.endswith(".npz"):
            sd = dict(np.load(path))
        elif path.endswith(".safetensors"):
            from qspec_tpu.model_loader.loader import _read_safetensors
            sd = _read_safetensors(path)
        else:
            raise LoRASlotError(f"unsupported adapter format: {path}")
        return self.load(name, sd, alpha=alpha)

    def unload(self, name: str) -> None:
        """Remove an adapter: zero its slot (so a stale delta can never
        leak into a later tenant) and free the name."""
        with self._lock:
            a = self._adapters.pop(name, None)
            if a is None:
                raise LoRASlotError(f"adapter {name!r} not loaded")
            if self._slot_in_use(a["slot"]):
                self._adapters[name] = a
                raise LoRASlotError(
                    f"adapter {name!r} is referenced by running requests")
            runner = self._engine.runner
            runner.params["lora"] = self._clear_slot(
                runner.params["lora"], a["slot"])

    # ---- internals ----------------------------------------------------
    def _active_slots(self) -> set:
        sch = self._engine.scheduler
        return {getattr(s, "lora_id", 0)
                for q in (sch.waiting, sch.running, sch.swapped) for s in q}

    def _slot_in_use(self, slot: int) -> bool:
        return slot in self._active_slots()

    def _free_slot(self) -> int:
        used = {a["slot"] for a in self._adapters.values()}
        for s in range(1, self.max_slots):
            if s not in used:
                return s
        # full: evict the LRU adapter whose slot no running request holds
        active = self._active_slots()
        victims = sorted((a["last_used"], n)
                         for n, a in self._adapters.items()
                         if a["slot"] not in active)
        if not victims:
            raise LoRASlotError(
                f"all {self.max_slots - 1} adapter slots are held by "
                "running requests")
        _, victim = victims[0]
        slot = self._adapters.pop(victim)["slot"]
        return slot

    def _clear_slot(self, lora, slot: int):
        import jax.numpy as jnp
        layers = {}
        for t, ab in lora["layers"].items():
            layers[t] = {
                "A": ab["A"].at[:, slot].set(jnp.zeros_like(ab["A"][:, slot])),
                "B": ab["B"].at[:, slot].set(jnp.zeros_like(ab["B"][:, slot])),
            }
        return {**lora, "layers": layers}
