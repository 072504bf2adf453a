"""tpukit — TPU-native remote-sensing image-compression benchmarking framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline (Angela0110/Image-compression-analysis): baseline preparation for
Sentinel-2 (Case A) and EnMAP (Case B) products, in-framework TPU codecs
(CCSDS-121/122/123, JPEG-LS, JPEG 2000-style, PNG), fused device metrics
(PSNR/SSIM/SAM/SID/LMSE), rate sweeps, CSV contracts, quicklooks and
rate-distortion figures.

Unlike the reference — which shells out to external native binaries per tile
per band (reference tools/run_codec.py:485-501) — every codec here is an
in-framework component: prediction/transform/entropy-cost stages run on TPU
via JAX/Pallas over HBM-resident (bands, H, W) tile stacks, and the exact
variable-length bitstream packing runs in a small C++ runtime
(tpukit/native) loaded through ctypes.
"""

__version__ = "0.1.0"
