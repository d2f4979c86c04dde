"""horizonnet_tpu — a TPU-native (JAX/XLA/Pallas) panorama room-layout framework.

Re-implements the full capability surface of sunset1995/HorizonNet
(see /root/reference and SURVEY.md) with a TPU-first design:

- ``geometry``: single source of truth for equirectangular <-> sphere <->
  floor-plane math (replaces the reference's post_proc/panostretch/eval
  duplication, SURVEY.md §1).
- ``ops``: XLA/Pallas compute primitives — wrap-padded convs, wrap bilinear
  gather-resampling, circular windowed max, scan/Pallas bi-LSTM.
- ``models``: flax ResNet/DenseNet encoders + height compression + the
  HorizonNet 1D head (reference model.py).
- ``data``: dataset indexing, label synthesis and on-device batched
  augmentation (reference dataset.py + misc/panostretch.py).
- ``postproc``: corner peak finding and Manhattan layout fitting
  (reference misc/post_proc.py, inference.py).
- ``evals``: cuboid and general layout metrics (reference eval_*.py) with an
  in-house polygon/polytope geometry core (no shapely/Qhull dependency).
- ``train`` / ``parallel``: pjit data-parallel training over a device mesh.
- ``preprocess``: LSD line detection + vanishing-point alignment
  (reference misc/pano_lsd_align.py, preprocess.py).
"""

__version__ = "0.1.0"
