"""Parallel execution strategies (SURVEY.md §2 strategy table).

- :mod:`ensemble` — data-parallel member axis (vmap within a chip,
  mesh-sharded across chips).
- :mod:`spatial` — domain decomposition of the x grid (shard_map halo
  exchange + distributed banded solve over the ICI ring).
"""

from .ensemble import Ensemble, ensemble_sharding, stack_parameters  # noqa
