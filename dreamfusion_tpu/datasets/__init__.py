"""Real multi-view datasets for DVGO pretraining (pipeline 3).

Rebuilds the reference's datasets/ stack as numpy-first loaders (no torch
DataLoader — batches feed a jitted step directly):

- loaders.py   — `load_data(cfg)` dispatch over the dataset formats
                 (reference: datasets/nerf/lib/load_data.py:20-197)
- rays.py      — per-view ray generation (pinhole/panoramic/NDC) and the
                 ray-gathering samplers (reference: datasets/nerf/utils.py,
                 datasets/nerf/nerf_dataset.py:86-139)
- provider.py  — DataProvider / DatasetFactory with the name-suffix grammar
                 (_test/_train/_val/_swap/_noaug/_partial/_ordered/_rand)
                 (reference: datasets/dataProvider.py:52-199)
"""

from dreamfusion_tpu.datasets.provider import DataProvider, DatasetFactory  # noqa: F401
from dreamfusion_tpu.datasets.loaders import load_data, inward_nearfar_heuristic  # noqa: F401
