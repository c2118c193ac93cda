"""Single-scene appearance editing — the fork's own use case.

Script equivalent of the reference's run.ipynb (cell 3: prompt "a DSLR photo
of a green ficus", 500 iters, lr 1e-3, 64x64 render, bg_radius=0,
max_steps=512, on a pretrained DVGO scene):

    python examples/edit_scene.py --pretrained_dvgo /data/scene.dvgo \
        --text "a DSLR photo of a green ficus"

Train a fresh .dvgo first with the pipeline if you don't have one:

    python -c "from dreamfusion_tpu.training.jobs import train_model; \
               from dreamfusion_tpu.training.jobs import params_for_nerf; \
               train_model(params_for_nerf('/data/nerf_synthetic/ficus', \
                                           save_name='ficus.dvgo'))"
"""

import argparse

from dreamfusion_tpu.config import Config
from dreamfusion_tpu.training.trainer import Trainer


def main(argv=None):
    ap = argparse.ArgumentParser("edit_scene")
    ap.add_argument("--pretrained_dvgo", required=True)
    ap.add_argument("--text", default="a DSLR photo of a green ficus")
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--workspace", default="trial_edit")
    ap.add_argument("--guidance", default="stable-diffusion")
    ap.add_argument("--sd_weights", default=None)
    args = ap.parse_args(argv)

    cfg = Config(
        text=args.text, guidance=args.guidance, sd_weights=args.sd_weights,
        backbone="dvgo", pretrained_dvgo=args.pretrained_dvgo,
        iters=args.iters, lr=1e-3, h=64, w=64,
        bg_radius=0.0, max_steps=512, dir_text=True, fp16=True,
        workspace=args.workspace,
    ).finalize()

    trainer = Trainer("edit", cfg)
    trainer.train(max_steps=cfg.iters)
    trainer.test(size=36)   # 360-degree video frames + gif
    trainer.save_mesh(resolution=256)


if __name__ == "__main__":
    main()
