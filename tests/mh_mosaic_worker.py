"""Worker for the 2-process multi-host mosaic test (run by test_sharding).

Each process hosts 4 virtual CPU devices; the global (dp=4, sp=2) mesh
spans both. The grid-banded mosaic step runs over globally sharded inputs
and every process checks the gathered result against a locally computed
single-process oracle.
"""
import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(proc_id)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from auromat_tpu.parallel import initialize, global_mesh

assert initialize()
assert jax.process_count() == 2 and len(jax.devices()) == 8

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

from auromat_tpu.ops.georef import DynGeorefParams, georef_latlon_dyn
from auromat_tpu.ops.regrid import bin_mean, fixed_grid
from auromat_tpu.parallel import make_grid_sharded_mosaic_step
from test_sharding import _burst

h, w, B = 64, 128, 4
params = _burst(B, h, w)
rng = np.random.default_rng(7)
imgs = (rng.random((B, h, w, 3)) * 255).astype(np.float64)
grid = fixed_grid(2, -89.0, 89.0, -179.0, 179.0)

mesh = global_mesh(dp=4, sp=2)
step = make_grid_sharded_mosaic_step(mesh, grid, h, w, channels=3,
                                     dtype=jnp.float64)
dyn = DynGeorefParams.stack(params, dtype=jnp.float64)

# globalize inputs: frames shard over dp (2 per process), rows over sp
def globalize(x, spec):
    sh = NamedSharding(mesh, spec)
    local = np.asarray(x)
    idx = [s for s in sh.addressable_devices_indices_map(local.shape).values()]
    # feed only this process's slice of the global value
    lo = proc_id * (B // 2)
    if spec == P("dp"):
        data = local[lo : lo + B // 2]
    elif spec == P("dp", "sp"):
        data = local[lo : lo + B // 2]
    else:
        data = local
    return jax.make_array_from_process_local_data(sh, data, local.shape)

dyn_g = jax.tree.map(lambda a: globalize(a, P("dp")), dyn)
imgs_g = globalize(imgs, P("dp", "sp"))

count, means = step(dyn_g, imgs_g)
count_all = multihost_utils.process_allgather(count, tiled=True)

# single-process oracle over ALL frames (inputs are deterministic)
px, py = np.meshgrid(np.arange(w, dtype=np.float64),
                     np.arange(h, dtype=np.float64))
lat, lon, data = [], [], []
for i, p in enumerate(params):
    d = DynGeorefParams.from_static(p, dtype=jnp.float64)
    out = georef_latlon_dyn(d, jnp.asarray(px), jnp.asarray(py),
                            dtype=jnp.float64, with_elevation=True)
    lat.append(np.asarray(out["lat"]))
    lon.append(np.asarray(out["lon"]))
    data.append(np.concatenate(
        [imgs[i], np.asarray(out["elevation"])[..., None]], axis=-1))
count_ref, _ = bin_mean(grid, np.stack(lat), np.stack(lon), np.stack(data))
count_ref = np.asarray(count_ref)

got = count_all[: grid.n_lat]
assert got.shape == count_ref.shape, (got.shape, count_ref.shape)
assert np.array_equal(got, count_ref), float(np.abs(got - count_ref).max())
assert count_all[grid.n_lat :].sum() == 0
print(f"proc {proc_id}: multi-host grid-banded mosaic OK "
      f"({int(got.sum())} samples)", flush=True)
