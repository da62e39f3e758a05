"""Performance benchmark harness.

Successor to the reference's ``clock_avg_runtime`` (reference
``src/predict.py:425-448``), which timed single-image ``(1,128,128,3)``
forwards in a Python loop. That measures dispatch overhead, not hardware.
This harness measures what production serving measures:

* ``clock_avg_runtime`` — kept for parity: warmup + timed single-image
  forwards, mean ± std ms.
* ``clip_inference_benchmark`` — the headline number: frames/sec/chip for
  end-to-end clip inference (uint8 frames -> fused Pallas preprocess ->
  bf16 forward -> softmax), batched and steady-state, device-synchronized
  timing.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.models.common import ModelSpec
from ab_line_classifier_tpu.ops.preprocess_pallas import preprocess_frames


def _build_flagship(model_name: str = "cutoffvgg16",
                    img_dim: Tuple[int, int] = (128, 128),
                    hparams: Optional[Dict] = None) -> ModelSpec:
    defaults = {
        "cutoffvgg16": {"LR_EXTRACT": 3e-4, "LR_FINETUNE": 9.3e-6,
                        "DROPOUT": 0.45, "CUTOFF_LAYER": 10,
                        "FINETUNE_LAYER": 7, "EXTRACT_EPOCHS": 6},
        "mobilenetv2": {"LR": 1e-4, "DROPOUT": 0.35, "L2_LAMBDA": 1e-3,
                        "NODES_DENSE0": 32, "FREEZE_IDX": 116,
                        "CUTOFF_IDX": 115},
        "cnn0": {"LR": 1e-3, "DROPOUT": 0.35, "L2_LAMBDA": 1e-4,
                 "NODES_DENSE0": 64, "KERNEL_SIZE": 3, "STRIDES": 1,
                 "MAXPOOL_SIZE": 2, "BLOCKS": 4, "INIT_FILTERS": 32,
                 "FILTER_EXP_BASE": 2},
        # remaining zoo rows, config.yml HPARAMS defaults (= the
        # reference's, models.py) — so every zoo model benchmarks by name
        "vgg16": {"LR": 0.01, "DROPOUT": 0.5, "L2_LAMBDA": 0.01,
                  "NODES_DENSE0": 64, "FREEZE_IDX": -1},
        "xception": {"LR": 0.01, "DROPOUT": 0.5, "L2_LAMBDA": 0.01,
                     "FREEZE_IDX": -1},
        "efficientnetb7": {"LR": 0.1, "DROPOUT": 0.5, "L2_LAMBDA": 0.01,
                           "FREEZE_IDX": -1},
        "custom_resnetv2": {"LR": 4.6e-5, "DROPOUT0": 0.45,
                            "DROPOUT1": 0.40, "STRIDES": 1, "BLOCKS": 2,
                            "INIT_FILTERS": 16},
    }
    hp = hparams or defaults.get(model_name)
    if hp is None:
        raise ValueError(f"no default hparams for {model_name!r}")
    return build_model(model_name, hp, tuple(img_dim) + (3,), 2,
                       mixed_precision=True)


def clock_avg_runtime(n_warmup_runs: int = 10, n_experiment_runs: int = 50,
                      model_name: str = "cutoffvgg16",
                      img_dim: Tuple[int, int] = (128, 128),
                      variables=None, spec: Optional[ModelSpec] = None,
                      verbose: bool = True) -> Tuple[float, float]:
    """Single-image latency, reference mechanism (predict.py:425-448):
    returns (mean_ms, std_ms)."""
    if spec is None:
        spec = _build_flagship(model_name, img_dim)
    if variables is None:
        variables = spec.init_variables(jax.random.PRNGKey(0))
    module = spec.module()
    fwd = jax.jit(lambda v, x: module.apply(v, x, train=False))
    rng = np.random.RandomState(0)
    times = np.zeros(n_experiment_runs)
    for i in range(n_warmup_runs):
        x = jnp.asarray(rng.randn(1, *img_dim, 3), jnp.float32)
        np.asarray(fwd(variables, x))
    for i in range(n_experiment_runs):
        x = jnp.asarray(rng.randn(1, *img_dim, 3), jnp.float32)
        t0 = time.perf_counter()
        # Materialize the output on host: block_until_ready has returned
        # early on this backend; the tiny [1, 2] copy is noise.
        np.asarray(fwd(variables, x))
        times[i] = time.perf_counter() - t0
    t_avg_ms = float(times.mean() * 1000)
    t_std_ms = float(times.std() * 1000)
    if verbose:
        print(f"Average runtime = {t_avg_ms:.3f} ms, "
              f"standard deviation = {t_std_ms:.3f} ms")
    return t_avg_ms, t_std_ms


def dispatch_guarded_seconds(run_many, fallback, n_iters: int) -> float:
    """Steady-state seconds for ``n_iters`` executions, defended against
    async-dispatch under-reporting: timing must SCALE with iteration count
    (doubling the iterations must ~double the elapsed time). When it does,
    the double-count run divided by two is the steady-state time; when it
    does not, the backend lied about completion (observed on this backend:
    ``block_until_ready`` returning early) and ``fallback`` — which pays a
    synchronization per iteration or equivalent — is trusted instead. One
    implementation for every benchmark in this module; see the CLAUDE.md
    phantom-regression note (a warmed single-count loop once measured an
    11x regression that this n-vs-2n check exposed as cache pollution).

    :param run_many: ``iters -> seconds``, synchronizing ONCE at the end.
    :param fallback: ``iters -> seconds`` with per-iteration sync.
    """
    dt = run_many(n_iters)
    dt2 = run_many(2 * n_iters)
    if 1.5 * dt <= dt2:
        return dt2 / 2.0
    return fallback(n_iters)


def single_frame_latency_benchmark(model_name: str = "cutoffvgg16",
                                   img_dim: Tuple[int, int] = (128, 128),
                                   chain_len: int = 64,
                                   n_warmup: int = 3, n_iters: int = 5,
                                   variables=None,
                                   spec: Optional[ModelSpec] = None,
                                   verbose: bool = True) -> Dict[str, float]:
    """DEVICE-side serving latency at batch 1 (ms/frame).

    Successor to the reference's ``clock_avg_runtime`` (reference
    predict.py:425-448) for the latency question its mechanism actually
    asks: how long does ONE frame take end-to-end through the production
    serving program (fused preprocess -> bf16 forward -> f32 softmax)?
    ``clock_avg_runtime`` here (kept above for mechanism parity) times a
    host loop, which on this tunneled backend measures mostly the
    O(10 ms) host<->device round-trip. This benchmark instead runs a
    dependency-CHAINED ``lax.scan`` of the batch-1 serving program on
    device: each iteration's input depends on the previous iteration's
    output, so iterations cannot overlap and ms/frame is genuine serial
    latency, not pipelined throughput.
    """
    if spec is None:
        spec = _build_flagship(model_name, img_dim)
    if variables is None:
        variables = spec.init_variables(jax.random.PRNGKey(0))
    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jnp.ndarray) and a.dtype == jnp.float32 else a,
        variables)
    module = spec.module()

    def serve(v, frames_u8):
        x = preprocess_frames(frames_u8, out_hw=tuple(img_dim),
                              preprocess_mode=spec.preprocess_mode,
                              out_dtype=jnp.bfloat16)
        return module.apply(v, x, train=False).astype(jnp.float32)

    def make_chained(length):
        def chained(v, frame):
            def body(x, _):
                probs = serve(v, x)
                # Force a true serial dependency: the next input is offset
                # by a runtime value that is always zero (probs <= 1, so
                # uint8(probs*1e-30) == 0) but that XLA cannot constant-
                # fold away — without it the loop body is invariant and
                # could be hoisted, turning latency into a single-execution
                # measurement.
                bump = (probs[0, 0] * 1e-30).astype(jnp.uint8)
                return x + bump, probs[0, 0]
            _, probs = jax.lax.scan(body, frame, None, length=length)
            return probs
        return chained

    chained_jit = jax.jit(make_chained(chain_len))
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.randint(0, 256, (1, *img_dim, 3)), jnp.uint8)
    for _ in range(n_warmup):
        np.asarray(chained_jit(bf16_vars, frame))

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = chained_jit(bf16_vars, frame)
        np.asarray(out)
        return time.perf_counter() - t0

    def fallback(iters: int) -> float:
        # Per-call sync fallback: each np.asarray pays the host<->device
        # round-trip (~10 ms on this tunneled backend), which at 64 frames
        # per chain would EXCEED the ~0.13 ms/frame being measured. Compile
        # the chain 8x longer so the per-sync overhead amortizes to a few
        # percent instead of reporting a phantom 2x latency regression.
        nonlocal chain_len
        chain_len = 8 * chain_len
        long_jit = jax.jit(make_chained(chain_len))
        np.asarray(long_jit(bf16_vars, frame))  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(long_jit(bf16_vars, frame))
        return time.perf_counter() - t0

    dt = dispatch_guarded_seconds(timed, fallback, n_iters)
    ms = dt / n_iters / chain_len * 1000
    result = {"ms_per_frame": float(ms), "chain_len": chain_len,
              "model": model_name}
    if verbose:
        print(f"{model_name} single-frame device latency: {ms:.3f} ms")
    return result


def clip_inference_benchmark(model_name: str = "cutoffvgg16",
                             batch_size: int = 512,
                             img_dim: Tuple[int, int] = (128, 128),
                             src_hw: Optional[Tuple[int, int]] = None,
                             n_warmup: int = 5, n_iters: int = 30,
                             variables=None,
                             spec: Optional[ModelSpec] = None,
                             use_pallas: Optional[bool] = None,
                             verbose: bool = True) -> Dict[str, float]:
    """Frames/sec/chip for end-to-end batched clip inference.

    The measured program is the production serving path: device-resident
    uint8 frames (as a decoded clip batch would be) -> fused preprocess
    (resize if ``src_hw`` differs + normalize, Pallas on TPU) -> bf16
    forward -> float32 softmax probabilities.
    """
    if spec is None:
        spec = _build_flagship(model_name, img_dim)
    if variables is None:
        variables = spec.init_variables(jax.random.PRNGKey(0))
    # Inference-only: pre-cast params to the compute dtype once.
    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jnp.ndarray) and a.dtype == jnp.float32 else a,
        variables)
    module = spec.module()
    src = tuple(src_hw or img_dim)

    def serve(v, frames_u8):
        x = preprocess_frames(frames_u8, out_hw=tuple(img_dim),
                              preprocess_mode=spec.preprocess_mode,
                              out_dtype=jnp.bfloat16, use_pallas=use_pallas)
        return module.apply(v, x, train=False).astype(jnp.float32)

    serve_jit = jax.jit(serve)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (batch_size, *src, 3)),
                         jnp.uint8)
    for _ in range(n_warmup):
        np.asarray(serve_jit(bf16_vars, frames))

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = serve_jit(bf16_vars, frames)
        # Device->host copy of the final output: executions on one device are
        # ordered, so this bounds the whole chain. (block_until_ready alone
        # has returned early on this backend.)
        np.asarray(out)
        return time.perf_counter() - t0

    def fallback(iters: int) -> float:
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(serve_jit(bf16_vars, frames))
        return time.perf_counter() - t0

    dt = dispatch_guarded_seconds(timed, fallback, n_iters)
    fps = batch_size * n_iters / dt
    serve_flops = flops_per_call(serve_jit, bf16_vars, frames)
    result = {
        "frames_per_sec": float(fps),
        "batch_size": batch_size,
        "ms_per_batch": float(dt / n_iters * 1000),
        "model": model_name,
        "flops_per_frame": (serve_flops / batch_size
                            if serve_flops else None),
    }
    if verbose:
        print(f"{model_name} clip inference: {fps:,.0f} frames/sec "
              f"(batch {batch_size}, {result['ms_per_batch']:.2f} ms/batch)")
    return result


def gradcam_benchmark(model_name: str = "cutoffvgg16",
                      batch_size: int = 256,
                      img_dim: Tuple[int, int] = (128, 128),
                      mode: str = "normal",
                      n_warmup: int = 3, n_iters: int = 10,
                      verbose: bool = True) -> Dict[str, float]:
    """Frames/sec for the fused Grad-CAM pass: preprocess -> forward ->
    vjp -> heatmap, ONE compiled program per batch (successor to the
    reference's per-frame eager GradientTape loop, reference
    gradcam.py:61-83; BASELINE.json config #4)."""
    from ab_line_classifier_tpu.explain.gradcam import build_fused_gradcam

    spec = _build_flagship(model_name, img_dim)
    variables = spec.init_variables(jax.random.PRNGKey(0))
    fused = build_fused_gradcam(spec, mode)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (batch_size, *img_dim, 3)),
                         jnp.uint8)

    def sync(out):
        # Materialize the tiny probs output only (the [B, H, W] heatmap
        # would cost ~0.1 s/batch of pure tunnel transfer); same-program
        # outputs are bounded together.
        return np.asarray(out[0])

    for _ in range(n_warmup):
        sync(fused(variables, frames))

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fused(variables, frames)
        sync(out)
        return time.perf_counter() - t0

    def fallback(iters: int) -> float:
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fused(variables, frames))
        return time.perf_counter() - t0

    dt = dispatch_guarded_seconds(timed, fallback, n_iters)
    fps = batch_size * n_iters / dt
    result = {"gradcam_frames_per_sec": float(fps),
              "batch_size": batch_size, "mode": mode,
              "ms_per_batch": float(dt / n_iters * 1000)}
    if verbose:
        print(f"{model_name} fused Grad-CAM [{mode}]: {fps:,.0f} frames/sec "
              f"(batch {batch_size})")
    return result


def flops_per_call(jitted, *args) -> Optional[float]:
    """XLA's counted FLOPs for one call of a jitted function, or None when
    the backend exposes no cost model. This is what makes the MFU claims in
    docs/PERFORMANCE.md checkable: frames/sec x FLOPs/frame must stay below
    chip peak."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:  # pragma: no cover - backend-dependent
        return None


def training_throughput_benchmark(model_name: str = "cutoffvgg16",
                                  batch_size: int = 256,
                                  img_dim: Tuple[int, int] = (128, 128),
                                  n_warmup: int = 3, n_iters: int = 10,
                                  phase: Optional[str] = None,
                                  verbose: bool = True) -> Dict:
    """Frames/sec for the full jitted train step (fwd+bwd+update), PER
    TRAINING PHASE, each labeled and carrying XLA-counted FLOPs/frame.

    cutoffvgg16 trains in two phases with very different backward costs
    (reference models.py:423-434): ``extract`` (all VGG convs frozen — the
    backward touches only the GAP head) and ``finetune`` (blocks >=
    FINETUNE_LAYER unfrozen — a partial conv backward). A single unlabeled
    number made the round-2 MFU bookkeeping uncheckable; every result now
    says which program it measured.

    :param phase: bench only the named phase; default benches all phases.
    :returns: ``{"phases": [per-phase dicts], **last_phase_dict}`` — the
        top-level keys keep the historical single-phase shape (the LAST
        phase, cutoffvgg16's finetune) for bench.py continuity.
    """
    from ab_line_classifier_tpu.train.loop import Trainer
    from ab_line_classifier_tpu.ops import metrics as M

    spec = _build_flagship(model_name, img_dim)
    # Full production step incl. the fused matmul augmentation (the
    # reference's five Keras augment layers, config.yml:78-85).
    aug = {"ZOOM_RANGE": 0.1, "WIDTH_SHIFT_RANGE": 0.2,
           "HEIGHT_SHIFT_RANGE": 0.2, "ROTATION_RANGE": 45,
           "HORIZONTAL_FLIP": True, "BRIGHTNESS_RANGE": 0.2}
    trainer = Trainer(spec, seed=0, compute_dtype=jnp.bfloat16,
                      aug_config=aug)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch_size, *img_dim, 3)),
                         jnp.uint8)
    labels = jnp.asarray(rng.randint(0, 2, batch_size), jnp.int32)
    mask = jnp.ones((batch_size,), jnp.float32)

    def chain_sync(st):
        # Materialize a scalar that depends on the last step: single-device
        # executions are ordered, so this bounds the whole chain without a
        # large device->host copy (block_until_ready has returned early on
        # this backend; see clip_inference_benchmark).
        return float(jnp.sum(jax.tree.leaves(st.params)[0][..., :1]))

    results = []
    for phase_idx, ph in enumerate(spec.phases):
        if phase is not None and ph.name != phase:
            continue
        trainer._set_phase_module(ph)
        state, tx = trainer.init_state(ph)
        step = trainer.make_train_step(ph, tx, phase_idx)
        metrics = M.init_metrics(2)
        step_flops = flops_per_call(step, state, metrics, images, labels,
                                    mask)

        for _ in range(n_warmup):
            state, metrics = step(state, metrics, images, labels, mask)
        chain_sync(state)

        def timed(iters: int):
            nonlocal state, metrics
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, metrics, images, labels, mask)
            chain_sync(state)
            return time.perf_counter() - t0

        def fallback(iters: int) -> float:
            nonlocal state, metrics
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, metrics, images, labels, mask)
                chain_sync(state)
            return time.perf_counter() - t0

        dt = dispatch_guarded_seconds(timed, fallback, n_iters)
        fps = batch_size * n_iters / dt
        r = {"phase": ph.name,
             "train_frames_per_sec": float(fps),
             "batch_size": batch_size,
             "flops_per_frame": (step_flops / batch_size
                                 if step_flops else None)}
        results.append(r)
        if verbose:
            gf = (f", {r['flops_per_frame'] / 1e9:.2f} GFLOP/frame"
                  if r["flops_per_frame"] else "")
            print(f"{model_name} train step [{ph.name}]: {fps:,.0f} "
                  f"frames/sec (batch {batch_size}{gf})")

    if not results:
        raise ValueError(f"no phase named {phase!r} in {model_name}")
    return {**results[-1], "phases": results}
