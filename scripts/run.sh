#! /bin/bash
# Example text-to-3D runs (reference: scripts/run.sh). On TPU there is no
# CUDA_VISIBLE_DEVICES; device selection is jax-level.

python main.py -O --text "a DSLR photo of cthulhu" --workspace trial_cthulhu
python main.py -O --text "a DSLR photo of a squirrel" --workspace trial_squirrel
python main.py -O --text "a DSLR photo of a cat lying on its side batting at a ball of yarn" --workspace trial_cat_lying
