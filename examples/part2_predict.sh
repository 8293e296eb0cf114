#!/bin/bash
# Prediction run on the part1 outputs (the reference's
# example/part2_gcc_mvapich2.sh workflow).
set -e
cd "$(dirname "$0")/.."
D=examples/data

python -m gmrm_tpu --predict \
  --bed-file $D/test.bed \
  --dim-file $D/test.dim \
  --phen-files $D/test1.phen,$D/test1_bis.phen,$D/test1_nas.phen,$D/test2.phen \
  --bim-file $D/test.bim \
  --ref-bim-file $D/test.bim \
  --out-dir examples/out
