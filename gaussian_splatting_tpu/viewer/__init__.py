from gaussian_splatting_tpu.viewer.network_gui import ViewerServer

__all__ = ["ViewerServer"]
