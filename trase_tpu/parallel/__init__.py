from .sharded import (  # noqa: F401
    interleave_rows,
    make_mesh,
    shard_train_state,
    sharded_render_fn,
    sharded_eval_render_fn,
    make_sharded_gaussian_step,
    make_sharded_feature_step,
    make_sharded_densify,
    make_sharded_reset_opacity,
)
from .trainer import ShardedTrainer  # noqa: F401
