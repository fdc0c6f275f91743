"""Multi-chip sharding tier (shard_map / XLA collectives over a device mesh).

New TPU-native capability — the reference is single-device; see SURVEY.md §5
for the design plan and :mod:`torchpme_tpu.parallel.sharded` for the sharding
layout.
"""

from .sharded import (
    SlabBucketing,
    compute_slab_bucketing,
    pad_to_multiple,
    sharded_ewald_potentials,
    sharded_mesh_potentials,
)
from .sharded_md import (
    ShardedMDState,
    compute_sharded_md_state,
    sharded_md_energy,
    sharded_md_energy_rows,
)
from .sharded_md_dipole import (
    ShardedMDDipoleState,
    compute_sharded_md_dipole_state,
    sharded_md_dipole_energy_rows,
)

__all__ = [
    "ShardedMDDipoleState",
    "ShardedMDState",
    "SlabBucketing",
    "compute_sharded_md_dipole_state",
    "compute_sharded_md_state",
    "compute_slab_bucketing",
    "pad_to_multiple",
    "sharded_ewald_potentials",
    "sharded_md_dipole_energy_rows",
    "sharded_md_energy",
    "sharded_md_energy_rows",
    "sharded_mesh_potentials",
]
