"""Flash-attention kernel parity tests (Pallas interpreter on CPU; the same
kernel was benchmarked on a real v5e chip at 3.3x the XLA attention path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.models.layers import sdpa
from tdc_video_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _ref(q, k, v, T, S, Hq, Hkv):
    causal = jnp.tril(jnp.ones((T, S), bool))[None, None]
    kr = jnp.repeat(k, Hq // Hkv, 2)
    vr = jnp.repeat(v, Hq // Hkv, 2)
    return sdpa(q, kr, vr, mask=causal)


@pytest.mark.parametrize(
    "B,T,Hq,Hkv,D",
    [
        (1, 128, 4, 2, 64),
        (2, 200, 4, 4, 64),  # non-multiple of block, MHA
        (1, 256, 8, 2, 128),  # GQA group 4
    ],
)
def test_parity_vs_sdpa(B, T, Hq, Hkv, D):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.float32)
    out = fa.flash_attention(q, k, v, causal=True)
    ref = _ref(q, k, v, T, T, Hq, Hkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_right_padded_rows_do_not_contaminate():
    """Valid rows of a right-padded batch must be unaffected by junk in the
    padding region (the flash path's implicit-mask invariant)."""
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 128, 2, 64
    valid = 77
    q = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    k = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    v = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    q2, k2, v2 = q.copy(), k.copy(), v.copy()
    for a in (q2, k2, v2):
        a[:, valid:] = 1e3  # garbage in the pad region
    o1 = np.asarray(fa.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
    o2 = np.asarray(fa.flash_attention(jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2), causal=True))
    np.testing.assert_allclose(o1[:, :valid], o2[:, :valid], rtol=1e-4, atol=1e-4)


def test_cache_longer_than_query():
    """Prefill into a larger cache: S > T with zeros beyond T."""
    rng = np.random.default_rng(2)
    B, T, S, H, D = 1, 128, 256, 2, 64
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    k = jnp.zeros((B, S, H, D), jnp.float32).at[:, :T].set(
        jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    )
    v = jnp.zeros((B, S, H, D), jnp.float32).at[:, :T].set(
        jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    )
    out = fa.flash_attention(q, k, v, causal=True)
    ref = _ref(q, k[:, :T], v[:, :T], T, T, H, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_non_causal_full_attention_parity():
    """mask=None non-causal (ViT towers) runs full attention on the flash path."""
    rng = np.random.default_rng(3)
    B, T, H, D = 2, 160, 4, 64
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    out = fa.flash_attention(q, k, v, causal=False)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_non_causal_with_mask_still_raises():
    q = jnp.zeros((1, 16, 2, 64))
    m = jnp.ones((1, 1, 16, 16), bool)
    with pytest.raises(NotImplementedError):
        fa.flash_attention(q, q, q, mask=m, causal=False)


class TestCausalMaskGuard:
    """attention(causal=True) debug guard: concrete masks must be exactly
    causal-over-right-padding (ADVICE r1, models/attention.py)."""

    def _mk(self, valid):
        T = 8
        km = np.zeros((1, 1, 1, T), bool)
        km[..., :] = valid
        tril = np.tril(np.ones((T, T), bool))[None, None]
        return jnp.asarray(tril & km)

    def test_right_padded_ok(self):
        from tdc_video_tpu.models.attention import _check_causal_mask

        m = self._mk(np.arange(8) < 5)
        _check_causal_mask(m, 8, 8)  # no raise

    def test_left_padded_rejected(self):
        from tdc_video_tpu.models.attention import _check_causal_mask

        m = self._mk(np.arange(8) >= 3)
        with pytest.raises(ValueError):
            _check_causal_mask(m, 8, 8)

    def test_packed_rejected(self):
        from tdc_video_tpu.models.attention import _check_causal_mask

        # block-diagonal packed-sequence mask is not plain causal
        T = 8
        seg = np.array([0, 0, 0, 0, 1, 1, 1, 1])
        block = seg[:, None] == seg[None, :]
        m = jnp.asarray((np.tril(np.ones((T, T), bool)) & block)[None, None])
        with pytest.raises(ValueError):
            _check_causal_mask(m, T, T)


class TestBackward:
    """custom_vjp grad parity vs differentiating the XLA sdpa reference."""

    def _grads(self, fn, q, k, v):
        def loss(q, k, v):
            o = fn(q, k, v)
            # non-uniform cotangent so dq/dk/dv are all exercised
            w = jnp.arange(o.size, dtype=o.dtype).reshape(o.shape) / o.size
            return jnp.sum(o * w)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    @pytest.mark.parametrize(
        "B,T,Hq,Hkv,D,causal",
        [
            (1, 128, 4, 2, 64, True),
            (2, 200, 4, 4, 64, True),   # padding to block multiple
            (1, 256, 8, 2, 128, True),  # GQA group 4
            (1, 160, 4, 4, 64, False),  # non-causal full (ViT towers)
        ],
    )
    def test_grad_parity(self, B, T, Hq, Hkv, D, causal):
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(0, 1, (B, T, Hq, D)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.float32)

        def ref(q, k, v):
            kr = jnp.repeat(k, Hq // Hkv, 2)
            vr = jnp.repeat(v, Hq // Hkv, 2)
            if causal:
                m = jnp.tril(jnp.ones((T, T), bool))[None, None]
                return sdpa(q, kr, vr, mask=m)
            return sdpa(q, kr, vr)

        dq, dk, dv = self._grads(
            lambda q, k, v: fa.flash_attention(q, k, v, causal=causal), q, k, v
        )
        rq, rk, rv = self._grads(ref, q, k, v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=2e-3, atol=2e-3)

    def test_padded_rows_zero_grad(self):
        """Right-padded rows (do=0 there) contribute zero grad to k/v."""
        rng = np.random.default_rng(8)
        B, T, H, D, valid = 1, 128, 2, 64, 100
        q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)

        def loss(q, k, v):
            o = fa.flash_attention(q, k, v, causal=True)
            keep = (jnp.arange(T) < valid)[None, :, None, None]
            return jnp.sum(jnp.where(keep, o, 0.0) ** 2)

        dq = jax.grad(loss, 0)(q, k, v)
        assert np.abs(np.asarray(dq[:, valid:])).max() == 0.0


class TestFullAttentionNHD:
    """Layout-native full-attention kernel (_flash_full_nhd): consumes the
    packed [B, N, H*D] projection layout directly so the tower forward emits
    no transposes/pads (the r3 profile showed those at ~2.5x the attention
    kernel's own cost)."""

    def test_matches_sdpa_d64(self, interpret_mode):
        rng = np.random.default_rng(0)
        B, N, H, D = 4, 130, 8, 64
        q = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        ref = sdpa(q, k, v)
        got = fa._flash_full_nhd(q, k, v, 1.0 / np.sqrt(D), 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    def test_grad_matches_sdpa(self, interpret_mode):
        rng = np.random.default_rng(1)
        B, N, H, D = 2, 133, 8, 64
        q = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        gr = jax.grad(lambda q, k, v: (sdpa(q, k, v) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
        gg = jax.grad(
            lambda q, k, v: (fa._flash_full_nhd(q, k, v, 1.0 / np.sqrt(D), 1) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(gr, gg):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)

    def test_dispatch_unpadded_full_path(self, interpret_mode):
        """D=72 (SigLIP) stays on the transposed kernel but now without
        explicit input pads on the primal path; parity must hold at the
        ragged length."""
        rng = np.random.default_rng(2)
        B, N, H, D = 2, 133, 16, 72
        q = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
        ref = sdpa(q, k, v)
        got = fa.flash_attention(q, k, v, causal=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    def test_head_block_selection(self):
        assert fa._nhd_head_block(64) == 2
        assert fa._nhd_head_block(128) == 1
        assert fa._nhd_head_block(72) == 16
