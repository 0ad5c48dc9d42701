"""Band-kernel bisect, round 2: each case in its own subprocess (a failed
remote compile can poison the process), clamped index maps vs raw.

python bench/probe_band_bisect2.py          # run all cases
python bench/probe_band_bisect2.py CASE     # run one case inline
"""

import subprocess
import sys

CASES = {
    # raw offset map (returns -1 at i=0): the round-3 design
    "raw_offset": """
def kern(c_ref, t_ref, o_ref):
    o_ref[:] = c_ref[:] + t_ref[:1, :].sum() * 0
spec_t = pl.BlockSpec((H, N), lambda i: (i * (T // H) - 1, 0), memory_space=pltpu.VMEM)
""",
    # clamped offset map: never out of range
    "clamped_offset": """
def kern(c_ref, t_ref, o_ref):
    o_ref[:] = c_ref[:] + t_ref[:1, :].sum() * 0
spec_t = pl.BlockSpec(
    (H, N), lambda i: (jnp.maximum(i * (T // H) - 1, 0), 0), memory_space=pltpu.VMEM
)
""",
    # plain aligned extra view (no offset): sanity
    "aligned_view": """
def kern(c_ref, t_ref, o_ref):
    o_ref[:] = c_ref[:] + t_ref[:1, :].sum() * 0
spec_t = pl.BlockSpec((H, N), lambda i: (i * (T // H), 0), memory_space=pltpu.VMEM)
""",
    # concat along axis 0 inside the kernel
    "concat0": """
def kern(c_ref, t_ref, o_ref):
    rows = jnp.concatenate([t_ref[H - 1:, :], c_ref[:]], axis=0)
    o_ref[:] = rows[1:, :]
spec_t = pl.BlockSpec((H, N), lambda i: (jnp.maximum(i * (T // H) - 1, 0), 0), memory_space=pltpu.VMEM)
""",
    # column flip by slice-concat
    "concat1": """
def kern(c_ref, t_ref, o_ref):
    c = c_ref[:]
    left = jnp.concatenate([c[:, 1:2], c[:, 0:1]], axis=1)
    padded = jnp.concatenate([left, c], axis=1)
    o_ref[:] = padded[:, 2:] + t_ref[:1, :].sum() * 0
spec_t = pl.BlockSpec((H, N), lambda i: (jnp.maximum(i * (T // H) - 1, 0), 0), memory_space=pltpu.VMEM)
""",
    # program_id select
    "pid_where": """
def kern(c_ref, t_ref, o_ref):
    i = pl.program_id(0)
    top = jnp.where(i == 0, c_ref[:H, :], t_ref[:])
    o_ref[:] = c_ref[:] + top[:1, :].sum() * 0
spec_t = pl.BlockSpec((H, N), lambda i: (jnp.maximum(i * (T // H) - 1, 0), 0), memory_space=pltpu.VMEM)
""",
}

TEMPLATE = """
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, N, T, H = 512, 512, 128, 8
x = jnp.array(np.random.default_rng(0).standard_normal((M, N), np.float32))
{body}
out = pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
    grid=(M // T,),
    in_specs=[
        pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        spec_t,
    ],
    out_specs=pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
)(x, x)
np.asarray(out)
print("CASE_OK", flush=True)
"""


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        code = TEMPLATE.format(body=CASES[name])
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
        )
        if "CASE_OK" in r.stdout:
            print(f"{name}: OK", flush=True)
        else:
            tail = (r.stderr or r.stdout).splitlines()
            key = next(
                (l for l in tail if "Mosaic" in l or "legalize" in l or "INTERNAL" in l),
                tail[-1] if tail else "?",
            )
            print(f"{name}: FAIL {key[:200]}", flush=True)


if __name__ == "__main__":
    main()
