from .cam import (
    CAM_METHODS,
    ablationcam,
    eigencam,
    eigengradcam,
    gradcam,
    gradcam_elementwise,
    gradcam_pp,
    hirescam,
    layercam,
    scorecam,
    xgradcam,
)
