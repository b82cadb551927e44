from . import se3, camera, warping, m_estimators  # noqa: F401
from .se3 import SE3  # noqa: F401
from .camera import PinholeCamera  # noqa: F401
