#!/bin/bash
# Reproduce the shipping model zoo from scratch (no external data).
#
# Trains all five families on the on-device procedural scene engine
# (`panodepth.synth`, `mix` distribution — the recipe in zoo/README.md),
# evaluates each on both held-out scene distributions, and stages the
# params-only checkpoints + sidecars under OUT (default: ./zoo_retrained).
#
# On a v5e this is ~6 h total (BiFuse's dual branches dominate); runs
# anywhere JAX runs (CPU works, slow).
#
#   scripts/retrain_zoo.sh [OUT_DIR]

set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

OUT="${1:-zoo_retrained}"
CK="$OUT/ckpts"
mkdir -p "$CK"

python -m panodepth.train_cli perspective x x "$CK/persp" --synth \
    --synth-version mix --steps 18000 --batch-size 16 --lr 3e-4
python -m panodepth.train_cli panoramic x x "$CK/pano" --synth \
    --synth-version mix --steps 14000 --batch-size 16 --lr 3e-4 --pano-width 512
python -m panodepth.train_cli hohonet x x "$CK/hoho" --synth \
    --synth-version mix --steps 14000 --batch-size 16 --lr 3e-4 --pano-width 512
python -m panodepth.train_cli bifuse x x "$CK/bifuse" --synth \
    --synth-version mix --steps 14000 --batch-size 16 --lr 3e-4 --pano-width 512
python -m panodepth.train_cli slicenet x x "$CK/slicenet" --synth \
    --synth-version mix --steps 14000 --batch-size 16 --lr 3e-4 --pano-width 512

for fam in persp:perspective pano:panoramic hoho:hohonet \
           bifuse:bifuse slicenet:slicenet; do
  dir="${fam%%:*}"; name="${fam##*:}"
  cp "$CK/$dir/${name}_final.params.npz" "$OUT/"
  cp "$CK/$dir/${name}.config.json" "$OUT/"
  for scenes in v1 v2; do
    echo "== eval $name ($scenes)"
    python -m panodepth.models.evaluate "$OUT/${name}_final.params.npz" \
        --scenes "$scenes"
  done
done

echo "zoo staged in $OUT/ — compare against zoo/README.md's table before promoting"
