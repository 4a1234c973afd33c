from gifgan_tpu.parallel.dp import shard_train_state, make_sharded_step

__all__ = ["shard_train_state", "make_sharded_step"]
