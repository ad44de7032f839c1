"""Forward-shape and train-mode smoke tests for every implemented zoo model.
Each model takes (B,H,W,3) pairs and must emit (B,H,W,1|2) change logits or
probabilities (reference head handling, train.py:170-174)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smow_net_tpu.models import get_model

# (name, input size, batch)
IMPLEMENTED = [
    ("fc_ef", 64, 2),
    ("snunet", 64, 2),
    ("dtcdscn", 64, 2),
    ("ifn", 64, 2),
    ("tfi_gr", 64, 2),
    ("a2net", 64, 2),
    ("bit", 64, 2),
    ("seifnet", 64, 2),
    ("elgcnet", 64, 2),
    ("changeformer", 64, 2),
    ("pa_former", 64, 2),
    ("afcf3d", 64, 2),
    ("rs_mamba", 64, 1),
    ("change_mamba", 64, 1),
    ("cd_mamba", 64, 1),
]


@pytest.mark.parametrize("name,size,batch", IMPLEMENTED)
def test_forward_shape(name, size, batch):
    try:
        model = get_model(name)
    except ImportError as e:
        pytest.skip(f"{name} not yet implemented: {e}")
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    out = model.apply(variables, x1, x2, train=False)
    assert out.shape[:3] == (batch, size, size), out.shape
    assert out.shape[-1] in (1, 2), out.shape
    assert np.isfinite(np.asarray(out)).all()
    # train mode must run (BN/dropout paths)
    out2, _ = model.apply(
        variables, x1, x2, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out2.shape == out.shape


@pytest.mark.parametrize("name", ["rs_mamba", "change_mamba"])
def test_enc_2b_branches_equivalent(name):
    """The A/B-toggled siamese-encoder batching (_ENC_2B) must be numerically
    exact in eval mode: the encoders are LayerNorm-only, so one (2B)-batched
    pass == two sequential passes. Pins the untoggled branch so a regression
    there is caught off-chip (ADVICE r4)."""
    import importlib

    mod = importlib.import_module(f"smow_net_tpu.models.zoo.{name}")
    model = get_model(name)
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    try:
        mod.set_enc_2b(True)
        out_2b = model.apply(variables, x1, x2, train=False)
        mod.set_enc_2b(False)
        out_seq = model.apply(variables, x1, x2, train=False)
    finally:
        mod.set_enc_2b(True)
    np.testing.assert_allclose(
        np.asarray(out_2b), np.asarray(out_seq), atol=2e-5, rtol=2e-5)
