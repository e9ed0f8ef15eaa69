"""A/B the ``_w16`` bf16 weight cache on the attached TPU.

``Engine.cache_weights`` (models/api.py) stores the float32 masters in
bfloat16 once at load.  The effect is PER-DISPATCH: with f32 weights as
jit arguments, every serving call re-reads 4 B/elem from HBM and
converts to the bf16 compute dtype (~160 MB read + 80 MB written for
the Xception twin); with cached bf16 weights the convert disappears and
the matmuls read half the bytes.  A ``lax.scan`` slope CANNOT see this
— XLA hoists loop-invariant converts out of the loop body — so this
harness uses the host-chained slope from the SegFormer campaign
(PERF.md round 3): each dispatch's output perturbs the next input,
weights stay a runtime argument, and the slope over two call counts
cancels fixed costs while keeping every per-dispatch cost.  The tunnel's
per-call enqueue overhead is inside the slope but identical across the
A/B arms.

Usage:  python scripts/bench_w16.py [--models xception deeplab] \
            [--iters 8 24]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+",
                    default=("deeplab_xception", "deeplab"))
    ap.add_argument("--iters", type=int, nargs=2, default=(8, 24))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.api import build_engine

    print(f"[bench_w16] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    n_lo, n_hi = args.iters

    for name in args.models:
        engines = {}
        for tag in ("f32", "w16", "f32+pack", "w16+pack"):
            eng = build_engine(name if tag.startswith("f32")
                               else name + "_w16")
            if tag != "f32":
                # same weights in every arm (cast/pack copies)
                eng.load_variables(engines["f32"].variables)
            eng.pack_weights(tag.endswith("pack"))
            engines[tag] = eng

        cfg = engines["f32"].cfg
        h, w = cfg.input_height, cfg.input_width
        leaves = [x for x in
                  jax.tree_util.tree_leaves(engines["f32"].variables)
                  if hasattr(x, "dtype") and x.dtype == jnp.float32]
        nbytes = sum(x.size * 4 for x in leaves)
        frame0 = jnp.asarray(rng.integers(0, 256, (h, w, 3), np.uint8))

        for tag, eng in engines.items():
            @jax.jit
            def step(variables, frame, eng=eng):
                lab = eng._predict_impl(eng._materialize(variables),
                                        frame[None])[0]
                p = (jnp.sum(lab.astype(jnp.int32)) % 2).astype(jnp.uint8)
                return frame ^ p

            v = eng.serving_variables

            def run(n):
                # Force with a host READ of a reduction, not
                # block_until_ready: through the tunnel the latter
                # returns early (measured 0.6 ms/dispatch on a 4 ms
                # model); a value transfer cannot lie.
                float(jnp.sum(step(v, frame0).astype(jnp.int32)))  # warm
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    c = frame0
                    for _ in range(n):
                        c = step(v, c)
                    float(jnp.sum(c.astype(jnp.int32)))
                    best = min(best, time.perf_counter() - t0)
                return best

            ts = [run(n) for n in (n_lo, n_hi)]
            dt = ts[1] - ts[0]
            ms = float("nan") if dt <= 0 else dt / (n_hi - n_lo) * 1e3
            print(f"{name:16s} [{tag:8s}] predict dispatch @ {w}x{h}: "
                  f"{ms:7.3f} ms ({1e3 / ms:.0f} fps)"
                  + (f"  [{len(leaves)} f32 leaves, {nbytes / 1e6:.0f} MB]"
                     if tag == "f32" else ""))


if __name__ == "__main__":
    main()
