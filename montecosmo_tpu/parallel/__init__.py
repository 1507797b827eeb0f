from montecosmo_tpu.parallel.mesh import make_device_mesh
from montecosmo_tpu.parallel.context import current_mesh_context, mesh_context
from montecosmo_tpu.parallel.cluster import (
    init_distributed, is_distributed, pod_mesh, process_summary,
)
from montecosmo_tpu.parallel.fft import (
    pencil_rfftn, pencil_irfftn, pencil_rfftk, sharded_poisson_forces_mesh,
)
from montecosmo_tpu.parallel.halo import halo_paint, halo_read
from montecosmo_tpu.parallel.chains import map_chains
from montecosmo_tpu.parallel.render import (
    sharded_bullfrog_steps, sharded_field_logpdf, sharded_lpt_observable,
    sharded_zeldovich_density,
)
from montecosmo_tpu.parallel.model import ShardedFieldLevelModel
from montecosmo_tpu.parallel.metrics import sharded_spectrum
