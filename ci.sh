#!/bin/sh
# CI entry point (reference analogue: .circleci/config.yml build->test).
# Runs the full oracle suite on the CPU backend (8 virtual devices exercise
# the multi-chip collective paths); the f32 TPU-dtype tier runs as a
# subprocess inside the suite (tests/test_f32_tier.py).
#
# The suite is run in chunks: a single pytest process accumulating all ~500
# compiled XLA programs can exhaust memory in constrained images (observed
# OOM-kill of the monolithic run). Chunk boundaries split the heaviest
# compile consumers (estimator/measurement cross-products, parallel suites)
# into separate processes; the persistent JAX compilation cache (set in
# conftest.py) keeps reruns fast.
set -e
python -m pytest tests/test_quaternion_math.py tests/test_native.py \
    tests/trajectories tests/sensors tests/test_cameras.py \
    tests/test_sfm.py tests/test_io.py tests/test_sew.py \
    tests/test_synthetic.py tests/test_reference_interop.py \
    tests/test_docs.py -q "$@"
python -m pytest tests/test_measurements.py tests/test_imu.py -q "$@"
python -m pytest tests/test_estimator.py tests/test_lm_semantics.py \
    tests/test_staged_jacobian.py -q "$@"
python -m pytest tests/test_assembly_kernel.py \
    tests/test_pallas_ops.py tests/test_linearize_kernel.py -q "$@"
python -m pytest tests/test_schur.py tests/test_banded.py \
    tests/test_iterative.py -q "$@"
python -m pytest tests/test_ate.py tests/test_residual_parity.py -q "$@"
python -m pytest tests/test_f32_tier.py tests/test_external_oracle.py -q "$@"
python -m pytest tests/test_parallel.py tests/test_segments.py \
    tests/test_segments_ba.py tests/test_distributed.py -q "$@"
