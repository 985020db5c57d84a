"""Correctness tests for the Pallas int8 kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from spef_tpu.ops.pallas.int8_ops import int8_depthwise3x3, int8_matmul_requant


def ref_matmul_requant(x, w, mult, bias, relu, out_inv_step, qmax, qmin, residual=None,
                       res_ratio=1.0, res_qmax=127.0, res_qmin=-128.0):
    acc = x.astype(np.int64) @ w.astype(np.int64)
    y = acc.astype(np.float64) * mult + bias
    if relu:
        y = np.maximum(y, 0.0)
    if out_inv_step is None:
        return y.astype(np.float32)
    q = np.clip(np.round(y * out_inv_step), qmin, qmax)
    if residual is not None:
        # Exact shared-grid sum requantized to the consumer grid — never an
        # intermediate int8 clamp (saturates for shared widths > 6).
        s = q + residual.astype(np.float64)
        q = np.clip(np.round(s * res_ratio), res_qmin, res_qmax)
    return q.astype(np.int8)


class TestInt8Matmul:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.x = rng.randint(-16, 16, (160, 64), dtype=np.int8)
        self.w = rng.randint(-8, 8, (64, 256), dtype=np.int8)
        self.mult = (rng.rand(256) * 1e-2).astype(np.float32)
        self.bias = rng.randn(256).astype(np.float32) * 0.1

    def test_int8_out_relu(self):
        with pltpu.force_tpu_interpret_mode():
            got = int8_matmul_requant(
                jnp.asarray(self.x), jnp.asarray(self.w), jnp.asarray(self.mult),
                jnp.asarray(self.bias), relu=True, out_inv_step=8.0,
                out_qmax=15.0, out_qmin=0.0, block_m=64, block_n=128,
            )
        want = ref_matmul_requant(self.x, self.w, self.mult, self.bias, True, 8.0, 15.0, 0.0)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_f32_out(self):
        with pltpu.force_tpu_interpret_mode():
            got = int8_matmul_requant(
                jnp.asarray(self.x), jnp.asarray(self.w), jnp.asarray(self.mult),
                jnp.asarray(self.bias), relu=False, out_inv_step=None,
                block_m=64, block_n=128,
            )
        want = ref_matmul_requant(self.x, self.w, self.mult, self.bias, False, None, 0, 0)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_residual_add(self):
        rng = np.random.RandomState(1)
        res = rng.randint(-7, 8, (160, 256), dtype=np.int8)
        with pltpu.force_tpu_interpret_mode():
            got = int8_matmul_requant(
                jnp.asarray(self.x), jnp.asarray(self.w), jnp.asarray(self.mult),
                jnp.asarray(self.bias), residual=jnp.asarray(res), relu=False,
                out_inv_step=4.0, out_qmax=7.0, out_qmin=-8.0,
                block_m=64, block_n=128,
            )
        want = ref_matmul_requant(self.x, self.w, self.mult, self.bias, False, 4.0, 7.0, -8.0,
                                  residual=res)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_residual_wide_shared_grid(self):
        """Shared width 8 (qmax 127): the projection+residual sum spans
        ±255 and must be requantized exactly to the consumer grid, not
        clamped to int8 first (ADVICE r2 regression)."""
        from spef_tpu.ops.pallas.int8_ops import xla_matmul_requant

        rng = np.random.RandomState(3)
        res = rng.randint(-127, 128, (160, 256), dtype=np.int8)
        # Large multiplier so the projection requant rails near ±127 often.
        mult = (self.mult * 50.0).astype(np.float32)
        kw = dict(relu=False, out_inv_step=1.0, out_qmax=127.0, out_qmin=-128.0,
                  res_ratio=0.5, res_qmax=127.0, res_qmin=-128.0)
        want = ref_matmul_requant(self.x, self.w, mult, self.bias, False, 1.0,
                                  127.0, -128.0, residual=res,
                                  res_ratio=0.5)
        with pltpu.force_tpu_interpret_mode():
            got = int8_matmul_requant(
                jnp.asarray(self.x), jnp.asarray(self.w), jnp.asarray(mult),
                jnp.asarray(self.bias), residual=jnp.asarray(res),
                block_m=64, block_n=128, **kw)
        np.testing.assert_array_equal(np.asarray(got), want)
        # The sum must actually exceed int8 range somewhere for this test
        # to bite: verify the unclamped sum saturates.
        q = np.clip(np.round(
            (self.x.astype(np.int64) @ self.w.astype(np.int64)) * mult
            + self.bias), -128, 127)
        assert np.abs(q + res).max() > 127
        got_xla = xla_matmul_requant(
            jnp.asarray(self.x), jnp.asarray(self.w), jnp.asarray(mult),
            jnp.asarray(self.bias), residual=jnp.asarray(res), **kw)
        np.testing.assert_array_equal(np.asarray(got_xla), want)

    def test_non_divisible_m(self):
        """M not a multiple of block_m (padding path)."""
        x = self.x[:100]
        with pltpu.force_tpu_interpret_mode():
            got = int8_matmul_requant(
                jnp.asarray(x), jnp.asarray(self.w), jnp.asarray(self.mult),
                jnp.asarray(self.bias), relu=True, out_inv_step=8.0,
                out_qmax=15.0, out_qmin=0.0, block_m=64, block_n=128,
            )
        want = ref_matmul_requant(x, self.w, self.mult, self.bias, True, 8.0, 15.0, 0.0)
        np.testing.assert_array_equal(np.asarray(got), want)


class TestInt8Depthwise:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_lax_conv(self, stride):
        rng = np.random.RandomState(2)
        b, h, wd, c = 2, 12, 16, 128
        x = rng.randint(0, 15, (b, h, wd, c), dtype=np.int8)
        w = rng.randint(-8, 8, (3, 3, c), dtype=np.int8)
        mult = (rng.rand(c) * 1e-2).astype(np.float32)
        bias = (rng.randn(c) * 0.05).astype(np.float32)
        in_step = 0.125
        out_inv_step = 8.0

        with pltpu.force_tpu_interpret_mode():
            got = int8_depthwise3x3(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(mult), jnp.asarray(bias),
                stride=stride, in_step=in_step, out_inv_step=out_inv_step,
                out_qmax=15.0, block_c=128,
            )

        # Reference via lax depthwise conv in f32.
        xf = x.astype(np.float32) * in_step
        wf = w.reshape(3, 3, 1, c).astype(np.float32)
        dn = jax.lax.conv_dimension_numbers(xf.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            jnp.asarray(xf), jnp.asarray(wf), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=dn, feature_group_count=c,
        )
        y = np.asarray(y) * mult + bias
        y = np.maximum(y, 0.0)
        want = np.clip(np.round(y * out_inv_step), 0, 15).astype(np.int8)
        np.testing.assert_array_equal(np.asarray(got), want)
