"""On-TPU model families replacing the reference's external CNNs.

* :mod:`.perspective` — MiDaS/LeReS-class monocular depth
  (reference's external ``run.py``/``test_depth.py``, Main.cpp:465-474);
* :mod:`.panoramic`  — UniFuse-class equirect+cubemap panoramic baseline;
* :mod:`.hohonet`    — HoHoNet-class horizon-feature panoramic baseline;
* :mod:`.train`      — losses, DP train step, orbax checkpoints;
* :mod:`.data`       — dataset discovery and batch pipelines.
"""

from .perspective import PerspectiveDepthNet  # noqa: F401
from .panoramic import PanoBaselineNet  # noqa: F401
from .hohonet import HorizonDepthNet  # noqa: F401
