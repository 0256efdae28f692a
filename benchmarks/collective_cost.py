"""TP collective-traffic audit for the multi-chip scaling bound.

Hardware for a real 2-host measurement is not available (one v5e chip
behind a tunnel), so this derives the 1->N-host scaling bound the honest
way left: lower the ACTUAL TP-sharded executables (the same
parallel/tp.make_tp_step_fns programs the engine and the driver dryrun
run) on a virtual 8-device mesh at Llama-3-8B dimensions, read every
collective out of the StableHLO, and price the bytes against link
bandwidths (reference concept: vllm distributed/parallel_state.py:984
group topology; the analysis the reference gets implicitly from NCCL
rings).

Method
------
* Abstract lowering (jax.jit(...).lower on ShapeDtypeStructs): no weights
  are materialized, so full 8B dims lower in seconds on CPU.
* The layer stack is a lax.scan, so trunk collectives appear once inside
  the scan's while region and execute once per layer: the script walks
  the StableHLO with brace nesting to classify each collective as
  in-loop (xL) or top-level (x1).
* Ring cost model: all_reduce moves 2*(n-1)/n * bytes per chip,
  all_gather / reduce_scatter move (n-1)/n * bytes, collective_permute
  moves bytes once.

Run: python benchmarks/collective_cost.py [--tp 8] [--batch 16] [--k 8]
Output: a per-phase table (markdown) of collective counts, bytes/call,
bytes/token, and projected step-time share at ICI and DCN bandwidths.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must precede first jax import (axon sitecustomize pins the TPU otherwise)
N_DEV = 8
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")
os.environ["JAX_PLATFORMS"] = "cpu"

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "ui32": 4,
                "i8": 1, "ui8": 1, "i4": 0.5, "ui4": 0.5, "i64": 8,
                "f64": 8, "i16": 2, "ui16": 2, "i1": 1, "f8E4M3FN": 1,
                "f8E5M2": 1}

_COLL_RE = re.compile(
    r"stablehlo\.(all_reduce|all_gather|reduce_scatter|collective_permute"
    r"|all_to_all)")
_TENSOR_RE = re.compile(r"tensor<([0-9x]*)x?([a-zA-Z][a-zA-Z0-9]*)>")


def _tensor_bytes(sig: str) -> float:
    """Sum the byte sizes of every tensor<> in an op's OPERAND signature."""
    total = 0.0
    for dims, dt in _TENSOR_RE.findall(sig):
        n = 1
        for d in dims.split("x"):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


_FUNC_RE = re.compile(r"func\.func\s+(?:public|private)?\s*@([\w$]+)")
_CALL_RE = re.compile(r"func\.call\s+@([\w$]+)")


def collectives_of(lowered_text: str):
    """-> list of (op, operand_bytes, in_loop) scanned from StableHLO.

    MLIR outlines a lax.scan's body into a private func (``@closed_call``)
    invoked from inside the ``stablehlo.while`` region, so loop membership
    needs a call graph, not just brace nesting.  Two passes:

    1. per-function walk: track while-region nesting (a while's region
       brace may open LINES after the op prints, so each tracked while is
       "armed" only once depth has risen above its open depth) and record
       every collective and every ``func.call`` site with its local
       in-while flag.  all_reduce / reduce_scatter carry a reduction
       REGION whose signature prints on the closing ``})`` line; region-
       free ops (all_gather, collective_permute) are inline.
    2. fixpoint over the call graph: a function is loop-executed if any
       caller invokes it from inside a while region, or any of its
       callers is itself loop-executed.
    """
    funcs = {}          # name -> {"colls": [...], "calls": [(callee, il)]}
    cur = None
    pending_whiles = []  # [open_depth, armed]
    pending_op = None    # (opname, local_in_loop) awaiting `})`-signature
    depth = 0
    for line in lowered_text.splitlines():
        fm = _FUNC_RE.search(line)
        if fm:
            cur = funcs.setdefault(fm.group(1), {"colls": [], "calls": []})
            pending_whiles, pending_op = [], None
        if cur is None:
            continue
        if "stablehlo.while" in line:
            pending_whiles.append([depth, False])
        if pending_op is not None and line.lstrip().startswith("})"):
            sig = line.split(":", 1)[-1].split("->")[0]
            cur["colls"].append(
                (pending_op[0], _tensor_bytes(sig), pending_op[1]))
            pending_op = None
        m = _COLL_RE.search(line)
        if m:
            in_loop = any(w[1] for w in pending_whiles)
            if line.rstrip().endswith("({"):
                pending_op = (m.group(1), in_loop)   # region op
            else:
                sig = line.rsplit(":", 1)[-1].split("->")[0]
                cur["colls"].append(
                    (m.group(1), _tensor_bytes(sig), in_loop))
        cm = _CALL_RE.search(line)
        if cm:
            cur["calls"].append(
                (cm.group(1), any(w[1] for w in pending_whiles)))
        depth += line.count("{") - line.count("}")
        for w in pending_whiles:
            if depth > w[0]:
                w[1] = True
        while pending_whiles and pending_whiles[-1][1] \
                and depth <= pending_whiles[-1][0]:
            pending_whiles.pop()

    loop_funcs = set()
    changed = True
    while changed:
        changed = False
        for name, f in funcs.items():
            caller_in_loop = name in loop_funcs
            for callee, local_il in f["calls"]:
                if (local_il or caller_in_loop) and callee not in loop_funcs:
                    loop_funcs.add(callee)
                    changed = True

    out = []
    for name, f in funcs.items():
        fn_in_loop = name in loop_funcs
        for op, nbytes, local_il in f["colls"]:
            out.append((op, nbytes, local_il or fn_in_loop))
    return out


def ring_factor(op: str, n: int) -> float:
    if op == "all_reduce":
        return 2.0 * (n - 1) / n
    if op in ("all_gather", "reduce_scatter"):
        return (n - 1) / n
    return 1.0  # collective_permute / all_to_all lower bound


def audit_phase(name, lowered, n_layers, tp, tokens_per_call):
    colls = collectives_of(lowered.as_text())
    rows = []
    total_wire = 0.0
    for op, nbytes, in_loop in colls:
        mult = n_layers if in_loop else 1
        wire = nbytes * ring_factor(op, tp) * mult
        total_wire += wire
        rows.append((op, mult, nbytes, wire))
    return {"phase": name, "collectives": rows,
            "wire_bytes_per_call": total_wire,
            "wire_bytes_per_token": total_wire / max(tokens_per_call, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--layers", type=int, default=32,
                    help="trunk depth the scan executes (Llama-3-8B: 32)")
    ap.add_argument("--lower-layers", type=int, default=2,
                    help="layers in the LOWERED config (scan body is "
                         "traced once; 2 keeps stacked-weight "
                         "ShapeDtypeStructs small)")
    args = ap.parse_args()

    import jax

    # the axon sitecustomize pre-imports jax pinned to the TPU; the config
    # update (not the env var) is the reliable post-import override
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qspec_tpu.config import ModelConfig
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.ops import kv_cache as kvc
    from qspec_tpu.ops.sampling import SamplingTensors
    from qspec_tpu.parallel.tp import (make_mesh, make_tp_step_fns,
                                       param_pspecs, cache_pspec)

    tp = args.tp
    assert len(jax.devices()) >= tp, jax.devices()
    # Llama-3-8B dims, shallow trunk for lowering (see --lower-layers)
    cfg = ModelConfig.llama3_8b(quant="w4", num_layers=args.lower_layers)
    mesh = make_mesh(tp)
    B, k = args.batch, args.k

    params = jax.eval_shape(lambda: init_params(cfg, seed=0))
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=64,
                               page_size=16)
    cache = jax.eval_shape(lambda: kvc.allocate(kv_cfg))
    fns = make_tp_step_fns(mesh, cfg, params, scheme="w4a16",
                           draft_scheme="w4a8", k=k)

    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    last = sds((B,), jnp.int32)
    pos = sds((B,), jnp.int32)
    tables = sds((B, 16), jnp.int32)
    st = SamplingTensors.greedy(B)
    st = jax.tree.map(
        lambda x: sds(x.shape, x.dtype) if hasattr(x, "shape") else x, st)
    key = sds((2,), jnp.uint32)
    d_toks = sds((B, k), jnp.int32)
    d_probs = sds((B, k, cfg.vocab_size), jnp.float32)
    T = 128
    p_tokens = sds((B, T), jnp.int32)
    p_pos = sds((B, T), jnp.int32)
    p_ctx = sds((B,), jnp.int32)

    audits = []
    lw = fns["decode"].lower(params, cache, last, pos, tables, st, key,
                             None)
    audits.append(audit_phase("AR decode (1 tok/seq)", lw, args.layers, tp,
                              B))
    lw = fns["draft"].lower(params, cache, last, pos, tables, st, key)
    audits.append(audit_phase(f"qspec draft (k={k}, w4a8)", lw,
                              args.layers, tp, B * k))
    lw = fns["verify"].lower(params, cache, last, d_toks, d_probs, pos,
                             tables, st, key)
    audits.append(audit_phase(f"verify (Q={k + 1}, w4a16)", lw, args.layers,
                              tp, B * (k + 1)))
    lw = fns["prefill"].lower(params, cache, p_tokens, p_pos, tables, p_ctx,
                              None)
    audits.append(audit_phase(f"prefill (T={T})", lw, args.layers, tp,
                              B * T))

    # ---- report ------------------------------------------------------
    ICI_GBS = 180.0   # v5e: 4 ICI links x ~45 GB/s usable per chip (3D
    # torus bidirectional), conservative ring estimate
    DCN_GBS = 12.5    # per-host 100 Gb/s NIC, the cross-host bottleneck
    print(f"## TP-{tp} collective audit — Llama-3-8B dims, B={B}, k={k}, "
          f"L={args.layers} (lowered L={args.lower_layers}, scan-resident "
          "trunk collectives scaled by L)\n")
    print("| phase | collective | x/call | MB moved/call (ring) | "
          "KB/token | t @ ICI | t @ DCN |")
    print("|---|---|---|---|---|---|---|")
    for a in audits:
        agg = {}
        for op, mult, nbytes, wire in a["collectives"]:
            key_ = op
            c, w = agg.get(key_, (0, 0.0))
            agg[key_] = (c + mult, w + wire)
        first = True
        for op, (cnt, wire) in sorted(agg.items()):
            t_ici = wire / (ICI_GBS * 1e9) * 1e6
            t_dcn = wire / (DCN_GBS * 1e9) * 1e6
            ph = a["phase"] if first else ""
            first = False
            ntok = (a["wire_bytes_per_call"]
                    / max(a["wire_bytes_per_token"], 1e-9))
            print(f"| {ph} | {op} | {cnt} | {wire / 1e6:.2f} | "
                  f"{wire / ntok / 1e3:.2f} | {t_ici:.0f} us | "
                  f"{t_dcn:.0f} us |")
        if not agg:
            print(f"| {a['phase']} | (none) | 0 | 0 | 0 | 0 | 0 |")
    print()
    total = {a["phase"]: a["wire_bytes_per_call"] for a in audits}
    print("Assumptions: ring all-reduce 2(n-1)/n, gather/scatter (n-1)/n; "
          f"ICI {ICI_GBS:.0f} GB/s/chip, DCN {DCN_GBS:.1f} GB/s/host; "
          "overlap ignored (upper bound on comm share).")

    # ---- 1 -> 2 host scaling projection ------------------------------
    # Measured single-chip 8B decode step: 7.71 ms at B=8
    # (BENCH_NOTES.md "8B decode step vs floor", scratch/exp36.log).
    # Scale compute linearly in B and divide by TP degree (weights,
    # lm_head and attention are all TP-sharded).
    STEP_MS_1CHIP_B8 = 7.71
    step_ms = STEP_MS_1CHIP_B8 * (args.batch / 8)
    decode_wire = total.get("AR decode (1 tok/seq)", 0.0)

    def eff(comp_us, comm_us):
        return comp_us / (comp_us + comm_us)

    comp8 = step_ms / tp * 1e3                  # us, per-chip @ TP-8
    comm8 = decode_wire / (ICI_GBS * 1e9) * 1e6
    # (a) DP-2: two independent TP-8 engines, router on host side.
    #     Cross-host bytes/token ~ 0 during decode.
    # (b) PP-2 x TP-8: per-chip layers halve; one ppermute of the
    #     bf16 hidden state crosses DCN per microbatch boundary.
    pp_xfer_us = (args.batch * 4096 * 2) / (DCN_GBS * 1e9) * 1e6
    comp16_pp = comp8 / 2
    # 1F decode schedule: both stages busy after warm-up; boundary
    # transfer overlaps the other stage's compute only if DCN time <
    # stage time — report the non-overlapped (worst) case.
    # (c) flat TP-16 ring spanning hosts: every collective's ring
    #     crosses the host boundary; the two cut edges throttle the
    #     whole ring to DCN bandwidth.
    comm16_dcn = decode_wire / (DCN_GBS * 1e9) * 1e6
    comp16_tp = step_ms / 16 * 1e3
    print(f"""
## Projected 1 -> 2 host scaling (decode, B={args.batch})

| layout | per-chip compute | cross-host traffic | projected eff. vs 1-host TP-{tp} |
|---|---|---|---|
| 1 host, TP-{tp} (ICI) | {comp8:.0f} us | — | {eff(comp8, comm8) * 100:.0f}% of ideal (comm {comm8:.0f} us on ICI) |
| 2 hosts, DP-2 x TP-{tp} | {comp8:.0f} us | ~0 (router only) | ~99% (throughput 2x, per-token latency unchanged) |
| 2 hosts, PP-2 x TP-{tp} | {comp16_pp:.0f} us | {args.batch * 4096 * 2 / 1e3:.0f} KB/step hidden | {eff(comp16_pp, pp_xfer_us + comm8) * 100:.0f}% (boundary {pp_xfer_us:.0f} us on DCN) |
| 2 hosts, flat TP-16 over DCN | {comp16_tp:.0f} us | all collectives | {eff(comp16_tp, comm16_dcn) * 100:.0f}% — DO NOT ship this layout |

The engine therefore scales across hosts with DP (engine/dp_router.py)
or PP (parallel/pp.py) and keeps TP rings on ICI (parallel/tp.py) —
the >=85% 1->2 host target is met by construction with DP-2 (~99%) and
PP-2 ({eff(comp16_pp, pp_xfer_us + comm8) * 100:.0f}%), while a flat
TP-16 ring over DCN would land at {eff(comp16_tp, comm16_dcn) * 100:.0f}%.
""")
    return total


if __name__ == "__main__":
    main()
