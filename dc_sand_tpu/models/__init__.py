"""Engine compositions: the F-engine, X-engine and B-engine "models".

These compose :mod:`dc_sand_tpu.ops` into jittable pipeline stages matching
the golden chain (:mod:`dc_sand_tpu.golden`) stage-for-stage; the
distributed FX/beamformer pipelines in :mod:`dc_sand_tpu.models.fx` wrap
them in ``shard_map`` over the mesh (BASELINE.json:5,10,11).
"""

from .fengine import f_engine  # noqa: F401
