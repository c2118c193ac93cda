"""dreamfusion_tpu CLI — text-to-3D training / testing / mesh export.

Mirrors the reference entry point (reference: main.py:10-162):

  python main.py -O --text "a hamburger" --workspace trial
  python main.py -O --text "a hamburger" --workspace trial --test
  python main.py -O --text "a hamburger" --workspace trial --test --save_mesh

Differences: runs on TPU via JAX; `--cuda_ray` is accepted as an alias of
`--grid_ray` (occupancy-grid renderer); fp16 means bf16 compute.
"""

import numpy as np

from dreamfusion_tpu.config import parse_config
from dreamfusion_tpu.guidance import build_guidance, none_guidance
from dreamfusion_tpu.models import build_model
from dreamfusion_tpu.training.trainer import Trainer


def main(argv=None, dpg=None):
    cfg = parse_config(argv)
    print(cfg)

    model = build_model(cfg)

    if cfg.test:
        trainer = Trainer("df", cfg, model, none_guidance(),
                          workspace=cfg.workspace, use_checkpoint=cfg.ckpt)
        if cfg.gui:  # interactive viewer on a loaded ckpt (main.py:113-115)
            return _launch_gui(cfg, trainer, dpg)
        trainer.test()
        if cfg.save_mesh:
            trainer.save_mesh(resolution=256)
    else:
        guidance = build_guidance(cfg)
        trainer = Trainer("df", cfg, model, guidance, workspace=cfg.workspace,
                          use_checkpoint=cfg.ckpt)
        if cfg.gui:  # interactive train-while-viewing (main.py:64,160-162)
            return _launch_gui(cfg, trainer, dpg)
        trainer.train(max_steps=cfg.iters)
        trainer.test()
        if cfg.save_mesh:
            trainer.save_mesh(resolution=256)


def _launch_gui(cfg, trainer, dpg=None):
    from dreamfusion_tpu.apps.gui import NeRFGUI

    gui = NeRFGUI(cfg, trainer)
    gui.render(dpg=dpg)
    return gui


if __name__ == "__main__":
    main()
