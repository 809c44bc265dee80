"""Mesh-size robustness: sharded paths at device counts other than 8.

The suite's virtual platform is pinned at 8 devices (conftest), so
other counts run in subprocesses that self-provision their own virtual
CPU platform — exercising the view/row padding logic with axis sizes
that do NOT divide the data dims (V=5 over 2 view shards, H=10 over 3
row shards), and a 16-device (4 x 4) mesh.
"""

import os
import subprocess
import sys

_WORKER = r"""
import sys
import numpy as np
import jax

n, vs, rs = (int(a) for a in sys.argv[1:4])
jax.config.update("jax_num_cpu_devices", n)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from sucre_tpu.models.sucre import init_params
from sucre_tpu.ops.matching import match_survey
from sucre_tpu.parallel import fit_sharded, make_mesh, match_survey_sharded
from sucre_tpu.solve import FitConfig, fit

assert len(jax.devices()) == n, (n, jax.devices())
mesh = make_mesh(vs, rs)

# Awkward dims: V=5 views, H=10 rows, so vs=2 pads views and rs=3 pads rows.
V, H, W = 5, 10, 16
rng = np.random.default_rng(0)
depths_mm = (
    rng.uniform(1500, 2500, size=(V, H, W))
    * (rng.uniform(size=(V, H, W)) < 0.9)
).astype(np.uint16)
rgbs = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
intrs = np.tile(np.array([20.0, 20.0, W / 2, H / 2], np.float32), (V, 1))
Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
ts = np.stack([np.array([0.05 * k, 0.0, 0.0], np.float32) for k in range(V)])
args = (
    jnp.asarray(depths_mm[:1]), jnp.asarray(intrs[:1]),
    jnp.asarray(Rs[:1]), jnp.asarray(ts[:1]),
    jnp.asarray(depths_mm), jnp.asarray(rgbs),
    jnp.asarray(intrs), jnp.asarray(Rs), jnp.asarray(ts),
)

obs_ref = jax.tree.map(lambda x: x[0], match_survey(*args, jnp.float32(1e-6)))
obs_sh = jax.tree.map(lambda x: x[0], match_survey_sharded(mesh, *args))
# sharded output pads views to a vs multiple (invalid) and target rows
# to an rs multiple (cropped back by the pipeline; see _dispatch_batch)
Vp, Hp = obs_sh.valid.shape[0], obs_sh.valid.shape[1]
assert Vp % vs == 0 and Vp >= V, (Vp, vs)
assert Hp % rs == 0 and Hp >= H, (Hp, rs)
assert not bool(np.asarray(obs_sh.valid[V:]).any())
assert not bool(np.asarray(obs_sh.valid[:, H:]).any())
obs_sh = jax.tree.map(lambda x: x[:, :H], obs_sh)
for f in ("valid", "z", "I"):
    a, b = getattr(obs_ref, f), getattr(obs_sh, f)[:V]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f)

img = rng.uniform(0, 1, size=(H, W, 3)).astype(np.float32)
cfg = FitConfig(num_iter=5)
res_ref = fit(init_params(image=img), obs_ref, cfg)
res_sh = fit_sharded(init_params(image=img), obs_ref, cfg, mesh)
np.testing.assert_allclose(
    np.asarray(res_ref.J), np.asarray(res_sh.J), atol=1e-5
)
np.testing.assert_allclose(
    np.asarray(res_ref.params.B), np.asarray(res_sh.params.B), atol=1e-6
)
print(f"mesh-{vs}x{rs}-on-{n}: ok")
"""


def _run(n, vs, rs):
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON", "XLA_FLAGS", "JAX_PLATFORMS"))
    }
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(n), str(vs), str(rs)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert f"mesh-{vs}x{rs}-on-{n}: ok" in out.stdout


def test_six_devices_2x3_padding():
    """Non-power-of-two mesh; neither axis divides the data dims."""
    _run(6, 2, 3)


def test_sixteen_devices_4x4():
    _run(16, 4, 4)
