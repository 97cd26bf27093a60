"""Executable apps — parity with the reference's ``src/projects/test``
binaries (SURVEY.md §2.10). Run as ``python -m gaussianrenderer_tpu.apps.<name>``:

  cull_sort_test  the main render app: load PLY, orbit loop, EMA FPS
  radix_test      sort benchmark sweep with JSONL output
  onesweep        sort correctness harness vs the 2-key oracle
  matrix_test     GEMM benchmark (Pallas kernel vs XLA dot)
  parser_test     PLY parse smoke
  camera_test     camera construction smoke
  window_test     interactive browser viewer on a synthetic scene
  train_test      training-loop demo (loss curve on a synthetic scene)
  fit             gr-fit: fit a scene from a capture dataset
  eval            gr-eval: PSNR/SSIM of a trained scene vs a dataset
  edit            gr-edit: merge/transform/crop/prune scenes on disk
"""
