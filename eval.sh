#!/bin/bash
# Reference-parity launcher (reference eval.sh)
python -m mobgs_tpu.cli.eval_cli -s data/stereo/seesaw/dense/ -m output/seesaw --iteration 10000
python -m mobgs_tpu.cli.metrics_cli -m output/seesaw -s data/stereo/seesaw/dense/
