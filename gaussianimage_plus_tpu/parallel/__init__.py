from .sharded import (
    batch_train_chunk,
    fit_batch,
    image_to_tile_rows,
    init_batch_train_state,
    make_mesh,
    shard_batch,
    tile_sharded_train_step,
)
