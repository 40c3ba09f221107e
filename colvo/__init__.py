"""ColVO-TPU: a TPU-native colonoscopic visual-odometry framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
HNUicda/CoIVO ("ColVO: Colonoscopic Visual Odometry Considering Geometric and
Photometric Consistency", /root/reference/README.md:1): joint self-supervised
monocular depth + 6-DoF ego-motion on colonoscopy video (README.md:5), the
DCDP coupled depth/pose strategy and LCC light-consistent calibration
(README.md:7), and the downstream applications — full-sequence VO,
stitched 3D colon reconstruction (README.md:29) and polyp localization
(README.md:9).

Layer map (SURVEY.md §1):
    colvo.geometry   — disp→depth, backprojection, SE(3), projection, warping
    colvo.models     — DepthNet, PoseNet, DCDP fusion (Flax)
    colvo.losses     — LCC, SSIM+L1 photometric, smoothness, geo-consistency
    colvo.kernels    — fused Pallas TPU kernels for the hot warp/loss path
    colvo.data       — frame sources, snippet dataset, intrinsics, prefetch
    colvo.runtime    — train step/loop, DP mesh over ICI, checkpoint, metrics
    colvo.vo         — VO driver, trajectory alignment, reconstruction, polyps
    colvo.evaluation — depth/pose metrics, the three reference figure types
"""

__version__ = "0.1.0"
