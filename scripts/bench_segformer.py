"""A/B the SegFormer transposed (CHW) stage campaign on the attached TPU.

Measures the full forward at 1024² (BASELINE config 5) for a sweep of
``chw_stages`` values — how many leading stages run in the transposed
(C, pixels) orientation (models/segformer.py, models/chw.py) — using the
serial-chained slope methodology from PERF.md (single-dispatch walls are
meaningless through the tunnel).

Usage:  python scripts/bench_segformer.py [--size b0] [--res 1024] \
            [--stages 0 1 2 3 4] [--iters 8 24] [--quant]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="b0")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--stages", type=int, nargs="+", default=(0, 1, 2, 3, 4))
    ap.add_argument("--iters", type=int, nargs=2, default=(8, 24))
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--torch-compat", action="store_true",
                    help="centered embeds + exact gelu (the "
                         "poured-HF-checkpoint configuration)")
    ap.add_argument("--head", type=int, nargs="+", default=(1,),
                    help="chw_head values to sweep (fully-transposed "
                         "decode head; only active at chw_stages=4)")
    ap.add_argument("--path", choices=("forward", "predict"),
                    default="forward",
                    help="'predict' measures the serving epilogue too: "
                         "argmax+remap (+ nearest label lift for the "
                         "quarter head) as in Engine.predict")
    ap.add_argument("--upsample", nargs="+", default=("full",),
                    choices=("full", "quarter"),
                    help="head_upsample values to sweep (quarter = "
                         "1/4-res logits, labels nearest-replicated; "
                         "only meaningful with --path predict)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.segformer import SegFormer

    r = args.res
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (1, r, r, 3),
                            jnp.float32)

    base = SegFormer.preset(args.size, quant=args.quant,
                            torch_compat=args.torch_compat)
    # Jitted init: eager init individually compiles/dispatches every
    # param op through the tunnel (~0.4 s each, minutes total — measured
    # round 3); one jitted program compiles once.
    v = jax.jit(lambda k, x: base.init(k, x, train=False))(
        jax.random.PRNGKey(1), x0[:, :64, :64, :])
    print(f"[bench_segformer] {args.size}{'+int8' if args.quant else ''} "
          f"@ {r}x{r} on {jax.devices()[0].device_kind}", file=sys.stderr)

    from bugcar_image_segmentation_tpu.models import remap
    from bugcar_image_segmentation_tpu.ops.resize import upsample_nearest_int
    table = remap.remap_table()

    def slope(module):
        if args.path == "predict":
            # Serving path: logits -> argmax+remap (quarter heads then
            # nearest-replicate the uint8 labels to input res, as
            # Engine._to_input_res does).  The label mean feeds the next
            # frame so the chain stays serially dependent.
            @jax.jit
            def step(variables, x):
                y = module.apply(variables, x, train=False)
                lab = remap.logits_to_drivability(y, table)
                if lab.shape[-1] != r:
                    lab = upsample_nearest_int(lab, r // lab.shape[-1])
                p = (jnp.mean(lab.astype(jnp.float32)) - 1.0) * 0.003
                return jnp.clip(x + p, 0.0, 1.0)
        else:
            @jax.jit
            def step(variables, x):
                y = module.apply(variables, x, train=False)
                p = jnp.tanh(jnp.mean(y, axis=-1, keepdims=True)) * 0.01
                if p.shape[1] != x.shape[1]:   # quarter head: broadcast
                    p = jnp.mean(p)
                return jnp.clip(x + p, 0.0, 1.0)

        def run(n):
            c = step(v, x0)
            float(jnp.sum(c))  # warm + force
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                c = x0
                for _ in range(n):
                    c = step(v, c)
                float(jnp.sum(c))
                best = min(best, time.perf_counter() - t0)
            return best

        ts = [run(n) for n in args.iters]
        return (ts[1] - ts[0]) / (args.iters[1] - args.iters[0]) * 1e3

    for k in args.stages:
        for hd in args.head:
            for up in args.upsample:
                m = SegFormer.preset(args.size, quant=args.quant,
                                     torch_compat=args.torch_compat,
                                     chw_stages=k, chw_head=bool(hd),
                                     head_upsample=up)
                t = slope(m)
                print(f"chw_stages={k} head={hd} up={up} "
                      f"path={args.path}: {t:.2f} ms/frame "
                      f"({1e3 / t:.1f} fps)")

    if set(args.upsample) >= {"full", "quarter"}:
        # Label disagreement full vs quarter on one frame (boundary
        # flips only; random weights = worst case for argmax stability).
        mf = SegFormer.preset(args.size, quant=args.quant,
                              head_upsample="full")
        mq = SegFormer.preset(args.size, quant=args.quant,
                              head_upsample="quarter")
        lf = remap.logits_to_drivability(
            jax.jit(lambda v, x: mf.apply(v, x, train=False))(v, x0), table)
        lq = upsample_nearest_int(remap.logits_to_drivability(
            jax.jit(lambda v, x: mq.apply(v, x, train=False))(v, x0),
            table), 4)
        d = float(jnp.mean((lf != lq).astype(jnp.float32)))
        print(f"label disagreement full vs quarter: {d:.4%}")


if __name__ == "__main__":
    main()
