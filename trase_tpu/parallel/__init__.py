from .sharded import (  # noqa: F401
    make_mesh,
    shard_train_state,
    sharded_render_fn,
    make_sharded_gaussian_step,
    make_sharded_feature_step,
)
