"""Bisect which construct in the band-stencil kernel Mosaic rejects.

The axon compile helper now fails gracefully (HTTP 500 -> JaxRuntimeError)
instead of SIGABRT, so all cases run in ONE process.  Each case is a
stripped-down variant; first failure per case prints the one-line reason.

python -c "import sys; sys.argv=['p']; exec(open('bench/probe_band_bisect.py').read())"
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, N, T, H = 512, 512, 128, 8
x = jnp.array(np.random.default_rng(0).standard_normal((M, N), np.float32))


def run(name, fn):
    try:
        out = fn()
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "legalize" in l), msg[0] if msg else "?")
        print(f"{name}: FAIL {key[:160]}", flush=True)


# 1. halo views with offset index maps, no program_id logic
def case_halo_views():
    def kern(c_ref, t_ref, b_ref, o_ref):
        o_ref[:] = c_ref[:] + t_ref[H - 1 :, :].sum() * 0 + b_ref[:1, :].sum() * 0

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // T,),
        in_specs=[
            pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i: (i * (T // H) - 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i: ((i + 1) * (T // H), 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, x, x)


# 2. program_id select between two VMEM views
def case_pid_select():
    def kern(c_ref, t_ref, o_ref):
        i = pl.program_id(0)
        n_i = pl.num_programs(0)
        top = jnp.where(i == 0, c_ref[:H, :], t_ref[:])
        bot = jnp.where(i == n_i - 1, c_ref[:H, :], t_ref[:])
        o_ref[:] = c_ref[:] + top[:1, :].sum() * 0 + bot[:1, :].sum() * 0

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // T,),
        in_specs=[
            pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i: (i * (T // H) - 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, x)


# 3. row concatenate in VMEM (axis 0)
def case_concat0():
    def kern(c_ref, t_ref, o_ref):
        rows = jnp.concatenate([t_ref[H - 1 :, :], c_ref[:], t_ref[:1, :]], axis=0)
        o_ref[:] = rows[1 : 1 + T, :]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // T,),
        in_specs=[
            pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i: (i * (T // H) - 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, x)


# 4. column concatenate + flip-by-slices (axis 1 halo building)
def case_concat1_flip():
    def kern(c_ref, o_ref):
        c = c_ref[:]
        left = jnp.concatenate([c[:, k : k + 1] for k in range(1, -1, -1)], axis=1)
        right = jnp.concatenate([c[:, N - 1 - k : N - k] for k in range(2)], axis=1)
        padded = jnp.concatenate([left, c, right], axis=1)
        o_ref[:] = padded[:, 2 : 2 + N]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // T,),
        in_specs=[pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x)


# 5. full laplace on the padded band, halo rows always taken from views
def case_full_noselect():
    d = 1

    def kern(c_ref, t_ref, b_ref, o_ref):
        c = c_ref[:]
        rows = jnp.concatenate([t_ref[H - d :, :], c, b_ref[:d, :]], axis=0)
        padded = jnp.concatenate(
            [rows[:, 0:d], rows, rows[:, N - d : N]], axis=1
        )
        res = (
            padded[:-2, 1:-1] + padded[2:, 1:-1] + padded[1:-1, :-2] + padded[1:-1, 2:]
            - 4 * padded[1:-1, 1:-1]
        )
        o_ref[:] = res

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // T,),
        in_specs=[
            pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i: (i * (T // H) - 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i: ((i + 1) * (T // H), 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, x, x)


for nm, fn in [
    ("halo_views", case_halo_views),
    ("pid_select", case_pid_select),
    ("concat0", case_concat0),
    ("concat1_flip", case_concat1_flip),
    ("full_noselect", case_full_noselect),
]:
    run(nm, fn)
