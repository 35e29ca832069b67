from linevis_tpu.render.camera import Camera  # noqa: F401
from linevis_tpu.render.transfer_function import TransferFunction  # noqa: F401
