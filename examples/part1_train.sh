#!/bin/bash
# Training run over 4 phenotype variants (the reference's
# example/part1_gcc_mvapich2.sh workflow: 10 iterations, seed 171014,
# including a duplicate and an NA-containing phenotype).
set -e
cd "$(dirname "$0")/.."
D=examples/data
[ -f $D/test.bed ] || python examples/make_example_data.py $D

python -m gmrm_tpu \
  --bed-file $D/test.bed \
  --dim-file $D/test.dim \
  --phen-files $D/test1.phen,$D/test1_bis.phen,$D/test1_nas.phen,$D/test2.phen \
  --group-index-file $D/test.gri \
  --group-mixture-file $D/test.grm \
  --iterations 10 \
  --seed 171014 \
  --shuffle-markers 1 \
  --out-dir examples/out \
  --output-thin-rate 1
