"""Device-mesh parallelism: sharding the observation stack and batching
targets across chips."""

from sucre_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    match_survey_sharded,
    pad_obs_to_mesh,
    shard_obs,
    replicate,
    fit_sharded,
    fit_sharded_pallas,
)
from sucre_tpu.parallel.batch import (  # noqa: F401
    fit_many,
    stack_obs,
    stack_params,
)
