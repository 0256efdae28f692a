"""Medusa candidate TREES (reference vllm/model_executor/models/medusa.py
heads + the Medusa paper's tree attention; the reference scores top-k
continuations per head instead of a single chain).

A topology is a tuple of PATHS in the Medusa-choices format: each path is a
tuple of per-depth candidate indices, e.g.

    ((0,), (1,), (2,), (0, 0), (0, 1), (1, 0), (0, 0, 0))

Path (i1, ..., id) is the node at depth d whose token is head d's
top-(id+1) candidate, reachable from the node (i1, ..., i_{d-1}) (which
must also be in the topology). Node tokens depend only on the ROOT hidden
state (Medusa heads are chain-independent), so the whole tree's tokens come
from one top-k per head.

The tree is STATIC: the flattened node order, each node's depth/parent and
the ancestor mask are compile-time constants. One verify pass scores
[rewrite-prefix | root | tree] in a single rectangle; tree queries attend
the committed context plus their tree ANCESTORS only (tree-structured
causal mask — ops/attention.py `tree=` / the Pallas kernel's per-row
ancestor bits). Acceptance walks the tree: at each node the target's
sampled (greedy: argmax) token either matches a child's proposed token —
the walk descends, the token is emitted — or the walk stops and that token
is the bonus/recovery emission. Every emitted token is sampled from the
target's distribution conditioned on its accepted prefix, so the transcript
is lossless at any temperature (greedy: bit-equal to AR).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

# 10-node default for 4 heads: hedge 4-wide at depth 1, keep the top-1
# spine deep (the shape of the reference's mc_sim-style sparse trees)
DEFAULT_TREE: Tuple[Tuple[int, ...], ...] = (
    (0,), (1,), (2,), (3,),
    (0, 0), (0, 1), (1, 0),
    (0, 0, 0), (0, 1, 0),
    (0, 0, 0, 0),
)


@dataclasses.dataclass(frozen=True)
class TreeSpec:
    choices: Tuple[Tuple[int, ...], ...]   # sorted paths
    num_nodes: int                         # T
    max_depth: int                         # D (= heads used)
    depth: Tuple[int, ...]                 # [T] depth of node i (1-based)
    parent: Tuple[int, ...]                # [T] node index of parent, -1=root
    head_idx: Tuple[int, ...]              # [T] proposing head (depth-1)
    cand_idx: Tuple[int, ...]              # [T] which top-k candidate
    ancestors: Tuple[Tuple[bool, ...], ...]  # [T, T] j is ancestor-or-self of i

    @property
    def max_cand(self) -> int:
        return max(self.cand_idx) + 1

    def ancestor_array(self) -> np.ndarray:
        return np.asarray(self.ancestors, bool)


def build_tree(choices=DEFAULT_TREE) -> TreeSpec:
    paths = tuple(sorted(set(tuple(p) for p in choices), key=lambda p: (len(p), p)))
    assert paths and all(len(p) >= 1 for p in paths), "paths must be non-empty"
    index = {p: i for i, p in enumerate(paths)}
    depth, parent, head_idx, cand_idx = [], [], [], []
    for p in paths:
        depth.append(len(p))
        head_idx.append(len(p) - 1)
        cand_idx.append(p[-1])
        if len(p) == 1:
            parent.append(-1)
        else:
            assert p[:-1] in index, f"path {p} has no parent in the topology"
            parent.append(index[p[:-1]])
    T = len(paths)
    anc = np.zeros((T, T), bool)
    for i in range(T):
        anc[i, i] = True
        j = parent[i]
        while j >= 0:
            anc[i, j] = True
            j = parent[j]
    return TreeSpec(choices=paths, num_nodes=T, max_depth=max(depth),
                    depth=tuple(depth), parent=tuple(parent),
                    head_idx=tuple(head_idx), cand_idx=tuple(cand_idx),
                    ancestors=tuple(tuple(bool(x) for x in row) for row in anc))


def medusa_propose_tree(medusa: dict, hidden, tree: TreeSpec):
    """Tree-node tokens from the K heads' top-k candidates.

    hidden [B, H] (root's post-norm hidden). Returns [B, T] int32 where
    column i is head head_idx[i]'s top-(cand_idx[i]+1) token — the whole
    tree from ONE head evaluation (Medusa heads are path-independent).
    """
    import jax
    import jax.numpy as jnp

    from qspec_tpu.ops._kernel_utils import backend_is_tpu

    cdt = jnp.bfloat16 if backend_is_tpu() else jnp.float32
    h = hidden.astype(cdt)
    z = jnp.einsum("bh,khg->bkg", h, medusa["w1"].astype(cdt),
                   preferred_element_type=jnp.float32)
    z = z + medusa["b1"][None].astype(jnp.float32)
    r = h[:, None].astype(jnp.float32) + jax.nn.silu(z)
    logits = jnp.einsum("bkg,kgv->bkv", r.astype(cdt),
                        medusa["head"].astype(cdt),
                        preferred_element_type=jnp.float32)  # [B, K, V]
    _, top = jax.lax.top_k(logits, tree.max_cand)            # [B, K, C]
    cols = [top[:, tree.head_idx[i], tree.cand_idx[i]]
            for i in range(tree.num_nodes)]
    return jnp.stack(cols, axis=1).astype(jnp.int32)         # [B, T]
