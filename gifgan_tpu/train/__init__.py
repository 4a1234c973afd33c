from gifgan_tpu.train import gan, vid

__all__ = ["gan", "vid"]
