"""Debug helper: print torch state_dict keys vs our flax param paths for a
zoo model pair. Uses jax.eval_shape (no compilation)."""
import sys
sys.path.insert(0, "tests")
sys.path.insert(0, ".")

def flax_paths(name, size=64):
    import jax, jax.numpy as jnp
    from smow_net_tpu.models import get_model
    m = get_model(name)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    v = jax.eval_shape(lambda r: m.init(r, x, x, train=False), jax.random.PRNGKey(0))
    from jax.tree_util import tree_flatten_with_path
    leaves, _ = tree_flatten_with_path(v["params"])
    for path, leaf in leaves:
        print("FLAX", ".".join(getattr(p, "key", str(p)) for p in path), tuple(leaf.shape))

def torch_keys(module):
    for k, v in module.state_dict().items():
        if "num_batches" not in k:
            print("TORCH", k, tuple(v.shape))
