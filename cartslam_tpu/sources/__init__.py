from .base import CameraIntrinsics, DataSource  # noqa: F401
from .kitti import KITTIDataSource  # noqa: F401
from .preloaded import PreloadedSource  # noqa: F401
from .synthetic import SyntheticDataSource  # noqa: F401
from .zed import ZEDDataSource  # noqa: F401
