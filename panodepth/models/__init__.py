"""On-TPU model families replacing the reference's external CNNs.

* :mod:`.perspective` — MiDaS/LeReS-class monocular depth
  (reference's external ``run.py``/``test_depth.py``, Main.cpp:465-474);
* :mod:`.panoramic`  — UniFuse-class equirect+cubemap panoramic baseline;
* :mod:`.hohonet`    — HoHoNet-class horizon-feature panoramic baseline;
* :mod:`.bifuse`     — BiFuse-class bidirectional two-branch baseline;
* :mod:`.slicenet`   — SliceNet-class vertical-slice recurrent baseline;
* :mod:`.train`      — losses, DP train step, orbax checkpoints;
* :mod:`.data`       — dataset discovery and batch pipelines.

The four panoramic families cover every baseline method the reference's
dataset walker names (bifuse/slicenet/unifuse/hohonet, Main.cpp:500-516).
"""

from .perspective import PerspectiveDepthNet  # noqa: F401
from .panoramic import PanoBaselineNet  # noqa: F401
from .hohonet import HorizonDepthNet  # noqa: F401
from .bifuse import BiFuseNet  # noqa: F401
from .slicenet import SliceNet  # noqa: F401
