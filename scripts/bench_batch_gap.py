#!/usr/bin/env python3
"""Ablate the batch-4 device-path gap (VERDICT r4 #3).

BENCH_r03/r04 both showed the batch-4 vmapped pipeline ~13% SLOWER per
frame than the single-frame program (646 vs 755 fps in r4) — the wrong
direction for the streaming ceiling.  Suspect: ``jax.vmap(run)`` turns
the BEV warp's packed gather into a batched gather, the exact lowering
the multi-camera pipeline measured 2.4x slower in round 2b and dodged
by unrolling builds per camera.

Four scan-slope measurements (ms/frame, serially-dependent lax.scan,
two iteration counts — bench.py's harness) on the bench configuration
(enet_w16, i420 transport, 512x256):

  single     : the single-frame program
  vmap4      : OLD batch path — jax.vmap of the whole single-frame run
  batch4     : NEW batch path — batched backbone + per-frame UNROLLED
               grid builds (pipeline.py run_chunk)
  batch4_vb  : batched backbone + VMAPPED grid builds — isolates the
               batched-gather cost from the forward restructuring

Usage:  python scripts/bench_batch_gap.py [--iters 25 75]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(25, 75))
    ap.add_argument("--stages", action="store_true",
                    help="add per-stage arms (forward / i420 / build)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from __graft_entry__ import _toy_calibration
    from bugcar_image_segmentation_tpu.configs import GridConfig, ModelConfig
    from bugcar_image_segmentation_tpu.io import SyntheticSource
    from bugcar_image_segmentation_tpu.models import remap
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.ops import yuv
    from bugcar_image_segmentation_tpu.pipeline import Pipeline

    cfg = ModelConfig()
    engine = build_engine("enet_w16", cfg)
    cal = _toy_calibration((cfg.input_height, cfg.input_width))
    pipe = Pipeline(engine, cal, GridConfig(8.0, 8.0, 0.1),
                    host_resize=True, transport="i420")
    print(f"[bench_batch_gap] on {jax.devices()[0].device_kind}",
          file=sys.stderr)

    frame = next(iter(SyntheticSource((480, 640, 3), num_frames=1)))
    dev_frame = pipe._prep(frame)
    tb = 4
    batch = jnp.stack([dev_frame] * tb)
    n_lo, n_hi = args.iters

    def scan_slope(fn, *args_, per_iter=1):
        ts = []
        for n in (n_lo, n_hi):
            def prog(*a, n=n):
                def body(carry, i):
                    f = a[-1] ^ i.astype(a[-1].dtype)
                    out = fn(*a[:-1], f)
                    # reduce per iteration: stage arms emit big logits
                    # maps, and scan stacking n of them would blow HBM
                    return carry, jnp.sum(out.astype(jnp.float32))
                _, outs = jax.lax.scan(body, 0,
                                       jnp.arange(n, dtype=jnp.uint8))
                return outs[-1]
            f = jax.jit(prog)
            float(jnp.sum(f(*args_).astype(jnp.float32)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(f(*args_).astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        dt = ts[1] - ts[0]
        if dt <= 0:
            return float("nan")
        return dt / (n_hi - n_lo) / per_iter * 1e3

    v = engine.variables

    single = lambda vv, f: pipe._run_impl(vv, f)[0]
    vmap4 = lambda vv, f: jax.vmap(
        lambda fr: pipe._run_impl(vv, fr)[0])(f)
    batch4 = lambda vv, f: pipe._run_batch_impl(vv, f)

    def batch4_vb(vv, frames):
        # batched forward, VMAPPED grid builds (the isolation arm)
        vv = engine._materialize(vv)
        frames = jax.vmap(
            lambda fr: yuv.i420_to_bgr(fr, pipe._model_hw))(frames)
        logits = engine._forward(vv, frames)
        segs = remap.logits_to_drivability(logits, engine.remap_table)
        segs = engine._to_input_res(segs)
        return jax.vmap(pipe.builder.build)(segs)

    arms = [
        ("single", single, (v, dev_frame), 1),
        ("vmap4 (old)", vmap4, (v, batch), tb),
        ("batch4 (new)", batch4, (v, batch), tb),
        ("batch4_vb (vmapped builds)", batch4_vb, (v, batch), tb)]

    if args.stages:
        # Per-stage arms: where does the residual batch-4 gap live?
        bgr1 = yuv.i420_to_bgr(dev_frame, pipe._model_hw)
        bgr4 = jnp.stack([bgr1] * tb)
        seg1 = np.asarray(engine.predict(np.asarray(bgr1)))
        seg4 = jnp.stack([jnp.asarray(seg1)] * tb)

        fwd1 = lambda vv, f: engine._forward(
            engine._materialize(vv), f[None])[0]
        fwd4 = lambda vv, f: engine._forward(engine._materialize(vv), f)
        i420_1 = lambda f: yuv.i420_to_bgr(f, pipe._model_hw)
        i420_4 = lambda f: jax.vmap(
            lambda x: yuv.i420_to_bgr(x, pipe._model_hw))(f)
        build1 = lambda s: pipe.builder.build(s)
        build4 = lambda s: jnp.stack(
            [pipe.builder.build(s[j]) for j in range(tb)])
        i420_4e = lambda f: yuv.i420_to_bgr(f, pipe._model_hw)
        i420_4u = lambda f: jnp.stack(
            [yuv.i420_to_bgr(f[j], pipe._model_hw) for j in range(tb)])
        arms += [
            ("fwd1", fwd1, (v, bgr1), 1),
            ("fwd4", fwd4, (v, bgr4), tb),
            ("i420_1", i420_1, (dev_frame,), 1),
            ("i420_4 (vmap)", i420_4, (batch,), tb),
            ("i420_4 (explicit batch)", i420_4e, (batch,), tb),
            ("i420_4 (unrolled)", i420_4u, (batch,), tb),
            ("build1", build1, (jnp.asarray(seg1),), 1),
            ("build4 (unrolled)", build4, (seg4,), tb)]

    for name, fn, fargs, per in arms:
        t = scan_slope(fn, *fargs, per_iter=per)
        print(f"{name:28s}: {t:.3f} ms/frame ({1e3 / t:.0f} fps)")


if __name__ == "__main__":
    main()
