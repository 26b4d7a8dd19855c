#!/bin/sh
# CI entry point (reference analogue: .circleci/config.yml build->test).
# Runs the full oracle suite on the CPU backend (8 virtual devices exercise
# the multi-chip collective paths); the f32 TPU-dtype tier runs as a
# subprocess inside the suite (tests/test_f32_tier.py).
set -e
python -m pytest tests/ -q "$@"
