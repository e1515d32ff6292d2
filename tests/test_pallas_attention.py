"""Pallas ViT attention kernel vs the f32 oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("b,n,h,d", [(2, 37, 2, 8), (1, 130, 4, 16)])
def test_vit_attention_matches_oracle(rng, b, n, h, d, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from patchfusion_tpu.ops import pallas_attention as pa

    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)

    ref = np.asarray(
        pa.vit_attention_reference(q.astype(jnp.float32),
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32)), np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pa.vit_attention(q, k, v), np.float32)
    # bf16 inputs + bf16 probabilities: ~1e-2 contract
    np.testing.assert_allclose(out, ref, atol=2.5e-2)


def test_fused_attention_pallas_impl_dispatch(rng, monkeypatch):
    """PF_ATTN_IMPL=pallas routes the bf16 path through the kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from patchfusion_tpu.models.dinov2 import fused_attention

    b, n, h, d = 1, 29, 2, 8
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    base = np.asarray(fused_attention(q, k, v), np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused_attention(q, k, v, impl="pallas"), np.float32)
    np.testing.assert_allclose(out, base, atol=2.5e-2)


@pytest.mark.parametrize("b,n,h,d,br", [(2, 37, 2, 8, 128), (1, 130, 4, 16, 128),
                                        (1, 250, 2, 8, 64)])
def test_vit_attention_blocked_matches_oracle(rng, b, n, h, d, br):
    from jax.experimental.pallas import tpu as pltpu

    from patchfusion_tpu.ops import pallas_attention as pa

    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)

    ref = np.asarray(
        pa.vit_attention_reference(q.astype(jnp.float32),
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32)), np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pa.vit_attention_blocked(q, k, v, br), np.float32)
    np.testing.assert_allclose(out, ref, atol=2.5e-2)
