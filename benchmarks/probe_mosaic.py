"""Probe Mosaic lowering support for the ops the fused block kernels need.

Each probe is a tiny pallas_call compiled for the real TPU; prints OK/FAIL
per pattern so kernel design can rely on known-good ops only.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass

R, W, C = 16, 32, 128


def run(name, kernel, x_shape=(R, W, C), out_shape=None, dtype=jnp.float32):
    x = jnp.asarray(np.random.RandomState(0).randn(*x_shape), dtype)
    out_shape = out_shape or x_shape
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        jax.block_until_ready(y)
        print(f"OK   {name}")
        return np.asarray(y)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None


# (a) leading-dim strided slice
def k_row_stride(x_ref, o_ref):
    o_ref[:] = jax.lax.slice(x_ref[:], (0, 0, 0), (R, W, C), (2, 1, 1))


# (b) sublane-dim strided slice (known problematic)
def k_col_stride(x_ref, o_ref):
    o_ref[:] = jax.lax.slice(x_ref[:], (0, 0, 0), (R, W, C), (1, 2, 1))


# (c) merge leading into sublane dim: (R, W, C) -> (R*W, C)
def k_merge(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(R * W, C)


# (d) split sublane: (R, W, C) -> (R, W//2, 2, C) then take [:, :, 0, :]
def k_split_take(x_ref, o_ref):
    t = x_ref[:].reshape(R, W // 2, 2, C)
    o_ref[:] = t[:, :, 0, :]


# (e) 3D x 2D dot: (R, W, C) x (C, N) contracting C
def k_dot3d(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# (f) selection dot: S (Wo, W) x slab (R, W, C) contracting W -> (Wo, R, C)
def k_seldot(s_ref, x_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        s_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# (g) untiled leading-dims transpose (Wo, R, C) -> (R, Wo, C)
def k_transpose01(x_ref, o_ref):
    o_ref[:] = jnp.transpose(x_ref[:], (1, 0, 2))


# (h) dynamic leading-dim row slice with runtime index
def k_dyn_row(x_ref, o_ref):
    i = pl.program_id(0) if False else 3
    o_ref[:] = x_ref[pl.ds(jnp.int32(2) * 1 + 1, 4), :, :]


# (i) int8 load + cast to bf16 + dot
def k_int8_dot(x_ref, w_ref, o_ref):
    a = x_ref[:].reshape(R * W, C).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(a, w_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def main():
    print(f"devices: {jax.devices()}")
    run("(a) leading-dim strided slice", k_row_stride, out_shape=(R // 2, W, C))
    run("(b) sublane strided slice", k_col_stride, out_shape=(R, W // 2, C))
    y = run("(c) reshape merge (R,W,C)->(RW,C)", k_merge, out_shape=(R * W, C))
    if y is not None:
        x = np.asarray(jnp.asarray(np.random.RandomState(0).randn(R, W, C), jnp.float32))
        assert np.allclose(y, x.reshape(R * W, C)), "merge WRONG VALUES"
        print("     merge values correct")
    run("(d) reshape split + take", k_split_take, out_shape=(R, W // 2, C))

    # two-input probes
    def run2(name, kernel, shapes, out_shape, dtypes=(jnp.float32, jnp.float32)):
        args = [jnp.asarray(np.random.RandomState(i).randn(*s), d)
                for i, (s, d) in enumerate(zip(shapes, dtypes))]
        try:
            y = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*args)
            jax.block_until_ready(y)
            print(f"OK   {name}")
            return np.asarray(y)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"FAIL {name}: {type(e).__name__}: {msg}")
            return None

    run2("(e) 3D x 2D dot over C", k_dot3d, [(R, W, C), (C, 64)], (R, W, 64))
    run2("(f) selection dot (Wo,W)x(R,W,C)", k_seldot, [(W // 2, W), (R, W, C)],
         (W // 2, R, C))
    run("(g) transpose untiled dims", k_transpose01, x_shape=(8, R, C), out_shape=(R, 8, C))
    run("(h) dynamic row slice", k_dyn_row, out_shape=(4, W, C))

    x8 = jnp.asarray(np.random.RandomState(3).randint(-127, 127, (R, W, C)), jnp.int8)
    w8 = jnp.asarray(np.random.RandomState(4).randint(-127, 127, (C, 64)), jnp.int8)
    try:
        y = pl.pallas_call(
            k_int8_dot,
            out_shape=jax.ShapeDtypeStruct((R * W, 64), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x8, w8)
        ref = np.asarray(x8, np.int32).reshape(R * W, C) @ np.asarray(w8, np.int32)
        exact = np.array_equal(np.asarray(y), ref.astype(np.float32))
        print(f"OK   (i) int8->bf16 dot, exact={exact}")
    except Exception as e:
        print(f"FAIL (i) int8->bf16 dot: {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
