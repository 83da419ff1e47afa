"""Multi-chip scaling: device meshes, sharded batch georeferencing, and the
mosaic regrid with cross-shard reduction.

The two parallel axes of this domain (SURVEY.md P6/P7):
  dp — frames sharded over chips (data parallel; replaces the reference's
       NuMap process pipeline, spacecraft.py:334-361)
  sp — image rows sharded over chips (spatial parallel; halo-free since the
       per-pixel chain is embarrassingly parallel — the only communication
       is the psum of partial regrid bins)
"""

from auromat_tpu.parallel.distributed import (  # noqa: F401
    global_mesh,
    initialize,
    is_multi_process,
)
from auromat_tpu.parallel.mosaic import (  # noqa: F401
    mosaic_sequence,
    null_georef_params,
)
from auromat_tpu.parallel.sharding import (  # noqa: F401
    make_grid_sharded_mosaic_step,
    make_mesh,
    make_sharded_mosaic_step,
    sharded_batch_georef,
)
