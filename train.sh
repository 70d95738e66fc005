#!/bin/bash
# Reference-parity launcher (reference train.sh)
python -m mobgs_tpu.cli.train -s data/stereo/seesaw/dense/ --expname "seesaw" --configs configs/stereo/seesaw.py
