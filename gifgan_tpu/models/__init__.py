from gifgan_tpu.models import dcgan, vid_dcgan

__all__ = ["dcgan", "vid_dcgan"]
