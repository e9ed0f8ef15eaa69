#!/usr/bin/env python3
"""Probe Mosaic lowerings needed by the fused sepconv kernel design.

Q1: sublane-dim strided slice inside a kernel (slab[0:2H:2, :, :])
Q2: reshape splitting the SUBLANE dim ((R, W, C) -> (R, W/2, 2, C))
Q3: reshape splitting a dim ABOVE sublane ((R, W, C) -> (R/2, 2, W, C))
Q4: shifted static-slice write into a zeroed VMEM scratch (halo build)

Each probe compiles+runs standalone on the attached TPU and compares
against the jnp reference on host.  Rationale: 'Pallas/Mosaic cannot do
arbitrary dynamic gathers' is already known (CLAUDE.md); strided/static
forms are undocumented — measure, don't guess.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W, C = 16, 64, 128
x = jnp.asarray(np.random.default_rng(0).normal(size=(R, W, C)),
                jnp.float32)


def try_probe(name, kernel, want, out_shape):
    try:
        got = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(x)
        ok = np.allclose(np.asarray(got), np.asarray(want), atol=1e-6)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL ({type(e).__name__}: {msg})")


def k_rowstride(x_ref, o_ref):
    o_ref[:] = x_ref[0:R:2, :, :]


try_probe("Q1 row(3rd-minor)-strided slice", k_rowstride, x[0:R:2],
          (R // 2, W, C))


def k_substride(x_ref, o_ref):
    o_ref[:] = x_ref[:, 0:W:2, :]


try_probe("Q1b sublane-strided slice", k_substride, x[:, 0:W:2],
          (R, W // 2, C))


def k_subreshape(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(R, W // 2, 2, C)[:, :, 0, :]


try_probe("Q2 sublane-splitting reshape", k_subreshape,
          x.reshape(R, W // 2, 2, C)[:, :, 0, :], (R, W // 2, C))


def k_rowreshape(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(R // 2, 2, W, C)[:, 0, :, :]


try_probe("Q3 row-splitting reshape", k_rowreshape,
          x.reshape(R // 2, 2, W, C)[:, 0], (R // 2, W, C))


# bf16 dtype sweep (round-5c finding: the strided_load lowerings above
# are dtype- AND shape-dependent — all four FAIL on bf16 at the fused
# sepconv's real shapes, and the f32 both-strided form additionally
# requires the lane dim to be exactly 128).
xb = x.astype(jnp.bfloat16)


def bf16_probe(name, kernel, want, out_shape):
    try:
        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
        )(xb)
        ok = np.allclose(np.asarray(got, np.float32),
                         np.asarray(want, np.float32), atol=1e-2)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:100]
        print(f"{name}: FAIL ({type(e).__name__}: {msg})")


bf16_probe("Q5 bf16 row-strided",
           lambda xr, o: o.__setitem__(slice(None), xr[0:R:2, :, :]),
           xb[0:R:2], (R // 2, W, C))
bf16_probe("Q5b bf16 sublane-strided",
           lambda xr, o: o.__setitem__(slice(None), xr[:, 0:W:2, :]),
           xb[:, 0:W:2], (R, W // 2, C))
bf16_probe("Q5c bf16 both-strided",
           lambda xr, o: o.__setitem__(slice(None), xr[0:R:2, 0:W:2, :]),
           xb[0:R:2, 0:W:2], (R // 2, W // 2, C))
bf16_probe("Q5d bf16 sublane reshape-split",
           lambda xr, o: o.__setitem__(
               slice(None), xr[:].reshape(R, W // 2, 2, C)[:, :, 0, :]),
           jnp.asarray(xb).reshape(R, W // 2, 2, C)[:, :, 0, :],
           (R, W // 2, C))


def k_halo(x_ref, o_ref, slab):
    slab[:] = jnp.zeros_like(slab)
    slab[1:R + 1, 1:W + 1, :] = x_ref[:]
    o_ref[:] = slab[0:R, 0:W, :] + slab[2:R + 2, 2:W + 2, :]


try:
    want = (jnp.pad(x, ((1, 1), (1, 1), (0, 0)))[0:R, 0:W]
            + jnp.pad(x, ((1, 1), (1, 1), (0, 0)))[2:R + 2, 2:W + 2])
    got = pl.pallas_call(
        k_halo,
        out_shape=jax.ShapeDtypeStruct((R, W, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R + 2, W + 2, C), jnp.float32)],
    )(x)
    ok = np.allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    print(f"Q4 shifted halo scratch: {'OK' if ok else 'WRONG RESULT'}")
except Exception as e:  # noqa: BLE001
    print(f"Q4 shifted halo scratch: FAIL ({type(e).__name__}: "
          f"{str(e).splitlines()[0][:120]})")
