"""Headline benchmark: sustained 640x480 camera→occupancy-grid FPS, 1 chip.

Measures the full fused pipeline (ENet 512x256 bf16 + BEV warp + binning,
one XLA program — BASELINE.json config 1 / the north-star metric) with
depth-2 async streaming, and reports sustained throughput against the
reference's stated 60 FPS optimum (reference README.md:23; the reference
runs 30 FPS camera-bound and "does not support tensorflow-CPU").

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/60}
plus auxiliary percentiles on stderr.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache

    # Per-backend persistent cache; also retries transient tunnel-plugin
    # registration failures while initializing the backend.
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.configs import GridConfig, ModelConfig
    from bugcar_image_segmentation_tpu.io import SyntheticSource
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.pipeline import Pipeline
    from __graft_entry__ import _toy_calibration

    cfg = ModelConfig()  # ENet 512x256, bf16 on TPU
    # "_w16": serve from the bf16 weight cache — scan-slope parity with
    # plain enet, but streaming dispatches once per FRAME, where the
    # cache removes ~0.12 ms of per-leaf convert kernels + marshal
    # (PERF.md rounds 3f/4c); same label class (0.06% tie flips on
    # chip, budgeted by the TPU tier).
    engine = build_engine("enet_w16", cfg)
    cal = _toy_calibration((cfg.input_height, cfg.input_width))
    # host_resize: shrink the frame before the host->device link (the
    # reference resizes host-side too, models.py:87) — on the tunneled
    # bench TPU the link is the bottleneck, not compute (2.2 ms/frame).
    # transport="i420": ship YUV 4:2:0 planes (1.5 B/px, what cameras
    # emit natively) and convert to BGR on device — halves the link
    # bytes again (393→196 KB/frame), the round-3 weather defense.
    pipe = Pipeline(engine, cal, GridConfig(8.0, 8.0, 0.1),
                    host_resize=True, transport="i420")

    compile_s = pipe.warmup((480, 640, 3))
    print(f"[bench] backend={jax.default_backend()} "
          f"compile={compile_s:.1f}s", file=sys.stderr)

    # Latency (blocking, per frame), from a host frame like a camera would.
    frame = next(iter(SyntheticSource((480, 640, 3), num_frames=1)))
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(pipe._run(engine.serving_variables, pipe._prep(frame)))
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lat, 50) * 1e3)

    # Link-bandwidth probe: time a few raw device_puts of a 4 MB buffer.
    # The end-to-end number is link-bound (PERF.md), so report the
    # session's measured MB/s alongside the fps — a bad headline with a
    # bad link reading is weather, not regression.
    def probe_link_mbps(n=3):
        buf = np.zeros((4 << 20,), np.uint8)
        rates = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(buf))
            rates.append(4.0 / (time.perf_counter() - t0))
        return float(np.median(rates))

    link_before = probe_link_mbps()

    # Sustained throughput: stream with deep async dispatch, chunked
    # result sync, and 4-frame transfer batching (BASELINE config 3's
    # batched streaming) — each knob amortizes the per-RPC cost of the
    # tunneled link, which dwarfs the 2.2 ms of per-frame compute.
    # Headline = MEDIAN of 9 timed trials after one untimed warm pass —
    # the sustained, reproducible number.  (The tunnel's bandwidth
    # fluctuates by multiples between runs; the best trial is the least
    # weather-contaminated estimate and is reported as an auxiliary.)
    n_frames = 100
    tb = 4
    host_frames = list(SyntheticSource((480, 640, 3), num_frames=n_frames))
    # Steady-state detection (round-3 lesson: a fixed-length warm pass
    # failed to absorb the link ramp in the driver's session — its first
    # timed trial read 59.5 fps on a run whose median was 267.8).  Run
    # untimed full-length passes until TWO consecutive passes exceed the
    # steady threshold, under a bounded budget; if the link never
    # stabilizes, label the run as weather in the metric string rather
    # than let a ramp artifact masquerade as the sustained worst case.
    steady_fps = 100.0
    warm_budget_s = 150.0
    warm_deadline = time.monotonic() + warm_budget_s
    warm_rates = []
    stable = False
    while time.monotonic() < warm_deadline and len(warm_rates) < 12:
        t0 = time.perf_counter()
        count = sum(1 for _ in Pipeline.stream(
            pipe, iter(host_frames), depth=16, sync_chunk=16,
            transfer_batch=tb))
        warm_rates.append(count / (time.perf_counter() - t0))
        if (len(warm_rates) >= 2 and warm_rates[-1] >= steady_fps
                and warm_rates[-2] >= steady_fps):
            stable = True
            break
    print(f"[bench] warm passes {[round(r, 1) for r in warm_rates]} fps "
          f"({'steady' if stable else 'NEVER STABILIZED'} "
          f"at threshold {steady_fps:.0f})", file=sys.stderr)
    # Timed trials, with labeled weather retries: the tunnel's bandwidth
    # can collapse MID-RUN (measured: a steady 240-fps session dipping
    # to 89 for two trials while the link probe read low) — that
    # measures the shared link, not the pipeline.  A sub-threshold
    # trial triggers a link probe; if bandwidth fell below half the
    # session's best, the trial is discarded as weather and re-run
    # (bounded), and the retry count is reported in the metric string —
    # labeled, never silent.  A slow trial on a HEALTHY link is kept:
    # that would be a real regression.
    trials = []
    weather_retries = 0
    max_weather_retries = 6
    best_link = link_before
    while len(trials) < 9:
        t0 = time.perf_counter()
        count = sum(1 for _ in Pipeline.stream(
            pipe, iter(host_frames), depth=16, sync_chunk=16,
            transfer_batch=tb))
        trial_fps = count / (time.perf_counter() - t0)
        if (trial_fps < steady_fps
                and weather_retries < max_weather_retries):
            mbps = probe_link_mbps(2)
            best_link = max(best_link, mbps)
            if mbps < 0.5 * best_link:
                weather_retries += 1
                print(f"[bench] trial {trial_fps:.1f} fps discarded: "
                      f"link probe {mbps:.1f} MB/s vs session best "
                      f"{best_link:.1f} (weather retry "
                      f"{weather_retries}/{max_weather_retries})",
                      file=sys.stderr)
                continue
        trials.append(trial_fps)
    fps = float(np.median(trials))
    best_fps = max(trials)
    worst_fps = min(trials)
    link_after = probe_link_mbps()

    # Device-side rate: N pipeline iterations inside ONE lax.scan program
    # (a single dispatch), timed at TWO iteration counts; the per-frame
    # time is the SLOPE, so the tunnel's fixed dispatch+sync overhead
    # (~35 ms, which a single timing would smear into every frame)
    # cancels exactly.  This is what co-located hardware would sustain.
    # Each iteration perturbs the frame with the loop index to defeat
    # loop-invariant code motion.
    import jax.numpy as jnp

    dev_frame = pipe._prep(host_frames[0])

    def run_scan(variables, frame, n):
        def body(carry, i):
            f = frame ^ i.astype(frame.dtype)   # defeat CSE/LICM
            grid, _ = pipe._run_impl(variables, f)
            return carry, grid

        _, grids = jax.lax.scan(body, 0,
                                jnp.arange(n, dtype=jnp.uint8))
        return grids[-1]

    def scan_slope(fn, *args, n_lo=50, n_hi=150, per_iter=1):
        ts = []
        for n in (n_lo, n_hi):
            f = jax.jit(lambda *a, n=n: fn(*a, n))
            jax.block_until_ready(f(*args))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(*args))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        # Tunnel timing noise can make the hi-count run read no slower
        # than the lo-count run; a raw difference would print a
        # negative/inf fps (ADVICE r2).  Guard and report NaN instead.
        dt = ts[1] - ts[0]
        if dt <= 0:
            return float("nan")
        return (n_hi - n_lo) * per_iter / dt

    dev_fps = scan_slope(run_scan, engine.variables, dev_frame)

    # Batched device-side rate: the streaming path ships 4 frames per put
    # and runs the vmapped program, so per-op fixed costs amortize — this
    # is the device throughput ceiling behind the sustained headline.
    batch = jnp.stack([dev_frame] * tb)

    def run_scan_batch(variables, frames, n):
        # The REAL batched program body (batched backbone + per-frame
        # unrolled grid builds) — not a vmap of the single-frame program,
        # whose batched warp gather cost ~0.2 ms/frame (the round-5b
        # batch-gap fix; vmapping `run` was both what this scan measured
        # AND what streaming shipped before it).
        def body(carry, i):
            f = frames ^ i.astype(frames.dtype)
            grids = pipe._run_batch_impl(variables, f)
            return carry, grids
        _, gs = jax.lax.scan(body, 0, jnp.arange(n, dtype=jnp.uint8))
        return gs[-1]

    dev_fps_b = scan_slope(run_scan_batch, engine.variables, batch,
                           n_lo=25, n_hi=75, per_iter=tb)

    print(f"[bench] sustained trials {[round(t, 1) for t in trials]} fps "
          f"(median {fps:.1f}, best {best_fps:.1f}, worst {worst_fps:.1f}); "
          f"link {link_before:.1f}->{link_after:.1f} MB/s; "
          f"p50 latency {p50_ms:.2f} ms; device-side {dev_fps:.0f} fps "
          f"(batch-{tb}: {dev_fps_b:.0f} fps)",
          file=sys.stderr)
    # Annotate weather only from MEASURED evidence, reconciled with the
    # trials that actually ran: a failed warm-pass gate with healthy
    # timed trials was just a long ramp (e.g. a cold compile ate the
    # budget) and gets no annotation; a failed gate with slow trials is
    # labeled with the probed bandwidth — stated as a reading, not a
    # verdict, so a genuine pipeline regression on a healthy link is
    # never excused as weather.
    weather = ""
    if not stable and fps < steady_fps:
        weather = (f"; warm passes never exceeded {steady_fps:.0f} fps "
                   f"in {warm_budget_s:.0f}s and the median stayed "
                   f"below it too (link probes "
                   f"{min(link_before, link_after):.0f} MB/s this "
                   f"session)")
    if weather_retries:
        weather += (f"; {weather_retries} trial(s) weather-retried on a "
                    f"probed link collapse")
    print(json.dumps({
        "metric": "frames/sec/chip sustained (median of 9), 640x480 "
                  "camera->occupancy-grid (ENet 512x256 w16 fused "
                  "pipeline, i420 transport, batched streaming; link "
                  f"{min(link_before, link_after):.0f}-"
                  f"{max(link_before, link_after):.0f} MB/s this session"
                  f"{weather})",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
