"""Per-stage serving attribution: where a model's device time goes.

The reference's only perf instrument is a whole-model host timer
(``clock_avg_runtime``, reference ``predict.py:425-448``); production
tuning needs per-stage accountability (which block is VPU-bound, which is
bandwidth-saturated, which has MXU headroom — see the EfficientNetB7
close-out in docs/PERFORMANCE.md). This module compiles each stage of a
zoo model as its OWN program and times it on device:

- ``auto_boundaries`` groups layers into stages by the zoo's shared
  naming convention (``block{N}...`` — EfficientNet ``block3a_expand``,
  MobileNetV2 ``block_3_expand``, VGG ``block3_conv2``, Xception/cnn0
  block names), validating every candidate boundary with ``graph.cut``'s
  closure check so residual/SE edges can never be severed.
- ``stage_segments`` builds the per-stage programs: ``cut(boundary_i)``
  truncates the graph and ``overrides={boundary_{i-1}: x}`` feeds the
  stage input, letting XLA dead-code-eliminate everything upstream — each
  segment is the exact serving computation of that stage (verified by
  ``tests/test_attribution.py``: chaining the segments reproduces the
  full forward bit-for-bit).
- ``attribute_stages`` times each segment as a dependency-chained
  ``lax.scan`` differenced at L-vs-2L chain lengths, so fixed dispatch /
  transfer overhead cancels exactly (the tunnel's ~10 ms round trips
  otherwise swamp millisecond stages), and pairs it with XLA
  cost-analysis FLOPs/bytes for roofline attribution.
"""

from __future__ import annotations

import re
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ab_line_classifier_tpu.graph import GraphModule

_STAGE_RE = re.compile(r"^(?:conv2d_)?(block_?|stage)(\d+)")


def _dominator_indices(graph) -> List[bool]:
    """``dom[i]`` — does layer ``i`` dominate the rest of the graph?

    True iff every later layer's inputs all sit at index ≥ i, i.e. the
    whole downstream computation flows through layer i alone. Only such
    layers are valid segment boundaries: overriding a NON-dominator
    leaves a residual/skip edge reading real upstream layers, so XLA
    cannot DCE the prefix and the "segment" silently recomputes the whole
    model up to its boundary (caught on Xception, whose cross-block adds
    are the stage outputs but carry untagged ``add_N`` names).
    """
    index_of = {s.name: i for i, s in enumerate(graph.layers)}
    n = len(graph.layers)
    # min input index of any layer strictly after i, computed by a
    # reverse sweep; dom[i] <=> that minimum is >= i.
    dom = [False] * n
    min_inp = n
    for i in range(n - 1, 0, -1):
        dom[i] = min_inp >= i
        for inp in graph.layers[i].inputs:
            min_inp = min(min_inp, index_of[inp])
    return dom


def auto_boundaries(graph) -> List[Tuple[str, str]]:
    """``[(stage label, boundary layer name), ...]`` in topological order.

    Layers whose names carry a stage tag (``block{N}``/``block_{N}``/
    ``stage{N}`` — the whole zoo's convention) group by N. Each stage's
    boundary is the LAST graph dominator between its final tagged layer
    and the next stage's first tagged layer — which lands on the tagged
    layer itself when stages are sequential (EfficientNet's
    ``block3g_add``) and on the untagged residual join when the stage
    output is one (Xception's ``add_2``). Stages with no dominator in
    their window merge into the following stage. Leading untagged layers
    (stem) fold into the first stage; everything after the last tag is
    the final ``head`` stage, bounded by the graph output.
    """
    layers = graph.layers
    first_idx: Dict[str, int] = {}
    last_idx: Dict[str, int] = {}
    labels: Dict[str, str] = {}
    order: List[str] = []
    for i, s in enumerate(layers):
        m = _STAGE_RE.match(s.name)
        if not m:
            continue
        key = m.group(2)
        if key not in first_idx:
            first_idx[key] = i
            order.append(key)
            # label keeps the model's own tag family (block3 vs stage3)
            labels[key] = m.group(1).rstrip("_") + key
        last_idx[key] = i
    if not order:
        raise ValueError(
            "no stage-tagged layers found; pass explicit boundaries")

    dom = _dominator_indices(graph)
    out: List[Tuple[str, str]] = []
    for pos, key in enumerate(order):
        last = pos + 1 == len(order)
        window_end = len(layers) if last else first_idx[order[pos + 1]]
        # Between two stages, take the LAST dominator before the next
        # stage begins (the residual join / pool glue belongs to the
        # earlier stage). The FINAL tagged stage instead takes the FIRST
        # dominator at/after its last tagged layer — the last-dominator
        # rule would swallow the whole head (pool/dense) into it.
        idxs = (range(last_idx[key], window_end) if last
                else range(window_end - 1, last_idx[key] - 1, -1))
        boundary = next((layers[i].name for i in idxs
                         if dom[i] and layers[i].name != graph.output),
                        None)
        if boundary is None:
            continue  # no clean cut point -> merge into the next stage
        out.append((labels[key], boundary))
    out.append(("head", graph.output))
    if len(out) < 2:
        raise ValueError(
            "stage tags found but no dominating boundaries; pass explicit "
            "boundaries")
    return out


def stage_segments(spec, boundaries: Optional[List[Tuple[str, str]]] = None):
    """Build ``[(label, boundary, prev_boundary, seg_fn), ...]``.

    ``seg_fn(variables, x)`` computes exactly stage ``label``: for the
    first segment ``x`` is the model input; for later segments ``x`` is
    the previous boundary's activation (the model-input argument only
    anchors the dead input node — XLA removes the skipped prefix).
    """
    import jax.numpy as jnp

    if boundaries is None:
        boundaries = auto_boundaries(spec.graph)
    else:
        # explicit boundaries get the same safety net that auto ones have
        # by construction: a non-dominating boundary cannot be overridden
        # cleanly — the segment would silently recompute the whole prefix.
        dom = _dominator_indices(spec.graph)
        index_of = {s.name: i for i, s in enumerate(spec.graph.layers)}
        for _label, b in boundaries:
            if b != spec.graph.output and not dom[index_of[b]]:
                raise ValueError(
                    f"boundary {b!r} does not dominate the graph: a later "
                    f"layer reads an earlier activation across it, so its "
                    f"segment would re-run the prefix; pick a residual "
                    f"join / pooling layer instead")
    segs = []
    prev = None
    for label, boundary in boundaries:
        g = (spec.graph if boundary == spec.graph.output
             else spec.graph.cut(boundary))
        mod = GraphModule(graph=g)

        def seg(v, x, _prev=prev, _mod=mod,
                _in_shape=tuple(spec.input_shape)):
            if _prev is None:
                return _mod.apply(v, x, train=False)
            anchor = jnp.zeros((x.shape[0],) + _in_shape, x.dtype)
            return _mod.apply(v, anchor, train=False,
                              overrides={_prev: x})

        segs.append((label, boundary, prev, seg))
        prev = boundary
    return segs


def _chain_seconds(chained_jit, variables, feed) -> float:
    """Wall seconds for ONE dispatched chain, min of 3 after a warmup (the
    chain output is a length-L vector — nothing big crosses the tunnel)."""
    np.asarray(chained_jit(variables, feed))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained_jit(variables, feed))
        best = min(best, time.perf_counter() - t0)
    return best


def attribute_stages(spec, variables=None, *, batch: int = 512,
                     boundaries: Optional[List[Tuple[str, str]]] = None,
                     iters: int = 16, dtype=None,
                     verbose: bool = True) -> List[Dict]:
    """Measure per-stage device time + FLOP/byte counts at ``batch``.

    Returns one dict per stage: ``ms`` (per-execution device time, chain
    L-vs-2L differenced, null-chain carry overhead subtracted), ``gflops``
    / ``gb_accessed`` (XLA cost analysis of the exact segment program) and
    the derived ``tflops_per_sec`` / ``gb_per_sec`` / ``flops_per_byte``.
    """
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    if variables is None:
        variables = spec.init_variables(jax.random.PRNGKey(0))
    variables = jax.tree.map(
        lambda a: a.astype(dtype)
        if isinstance(a, jnp.ndarray) and a.dtype == jnp.float32 else a,
        variables)
    segs = stage_segments(spec, boundaries)

    # boundary activation shapes from one traced pass
    cap = tuple(b for _, b, _p, _f in segs if b != spec.graph.output)
    mod_cap = spec.module(capture=cap)
    x0 = jnp.zeros((batch,) + tuple(spec.input_shape), dtype)
    _, cap_shapes = jax.eval_shape(
        lambda v, x: mod_cap.apply(v, x, train=False), variables, x0)
    rng = np.random.RandomState(0)

    def make_chain(body_fn, length):
        def chained(v, a):
            def body(x, _):
                out = body_fn(v, x)
                o0 = out.ravel()[0]
                # runtime-zero bump: keeps iterations serially dependent
                # and un-hoistable (single_frame_latency_benchmark recipe)
                bump = (o0 * 1e-30).astype(a.dtype)
                return x + bump, o0
            _, ys = jax.lax.scan(body, a, None, length=length)
            return ys
        return jax.jit(chained)

    rows = []
    for label, boundary, prev, seg in segs:
        feed = (x0 if prev is None else jnp.asarray(
            rng.standard_normal(cap_shapes[prev].shape) * 0.1, dtype))
        cost = jax.jit(seg).lower(variables, feed).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, list) else (cost or {})

        def null(v, a):
            return a.ravel()[:1]

        t_seg = (_chain_seconds(make_chain(seg, 2 * iters),
                                variables, feed)
                 - _chain_seconds(make_chain(seg, iters),
                                  variables, feed)) / iters
        t_null = (_chain_seconds(make_chain(null, 2 * iters),
                                 variables, feed)
                  - _chain_seconds(make_chain(null, iters),
                                   variables, feed)) / iters
        t = max(t_seg - t_null, 1e-9)
        flops = float(cost.get("flops", 0.0))
        hbm = float(cost.get("bytes accessed", 0.0))
        rows.append({
            "stage": label, "boundary": boundary,
            "ms": round(t * 1e3, 3),
            # share of the raw chain body spent in the carry update (it is
            # subtracted out of ms); meaningless when the segment itself
            # is at measurement noise, so clamp to ±1
            "chain_overhead_share": round(
                max(-1.0, min(1.0, t_null / max(t_seg, 1e-12))), 3),
            "gflops": round(flops / 1e9, 2),
            "tflops_per_sec": round(flops / t / 1e12, 2),
            "gb_accessed": round(hbm / 1e9, 3),
            "gb_per_sec": round(hbm / t / 1e9, 1),
            "flops_per_byte": round(flops / hbm, 2) if hbm else None,
        })
        if verbose:
            print(f"[stage] {rows[-1]}", flush=True)
    return rows
