"""TPU check: sharded_coverage_irs(engine='batched') == map engine on a
1-device ('rays','rx') mesh."""
import numpy as np, jax, jax.numpy as jnp
from rfx import sampler
from rfx.coverage import make_grid
from rfx.geometry import make_room
from rfx.parallel import make_mesh
from rfx.parallel.dist import sharded_coverage_irs
from rfx.tracer import Scene
_ = np.asarray(jnp.ones((8,128)))
scene = Scene.from_mesh(make_room())
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), 65536)
grid = jnp.asarray(make_grid(range(-12, 13, 8), range(-12, 13, 8), [2, 8]))
tx = [3.0, 2.0, 2.0]
mesh = make_mesh({"rays": 1, "rx": 1})
kw = dict(max_bounces=2, nbins=10000, sample_rate_hz=100e9, rx_batch=8)
a = np.asarray(sharded_coverage_irs(scene, tx, dirs, grid, 0.5, mesh, engine="map", **kw))
b = np.asarray(sharded_coverage_irs(scene, tx, dirs, grid, 0.5, mesh, engine="batched", **kw))
bad = ~np.isclose(a, b, rtol=1e-4, atol=1e-11)
print(f"sharded batched vs map: {bad.sum()} mismatched of {a.size}; nonzero {np.count_nonzero(a)} vs {np.count_nonzero(b)}")
ii = np.argwhere(bad)
for r, c in ii[:8]: print(f"  rx{r} bin{c}: map={a[r,c]:.8g} batched={b[r,c]:.8g}")
assert bad.sum() == 0
print("OK")
