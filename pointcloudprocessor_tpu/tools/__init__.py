"""Offline tooling — rebuilds of the reference's `scripts/` layer (L8):

- :mod:`.vo_interp` — VO -> image-timestamp odometry resampler
  (`scripts/make_vo_odom_for_fastlio.py`), producing the pipeline's
  ``vo_interpolated_odom.txt`` input.
- :mod:`.image_balance` — CLAHE + gamma + adaptive-gamma batch image
  balance (`scripts/image_color_balance_autonomous.py`).
- :mod:`.match_masks` — mask-PNG timestamp matcher (`src/extractMaskImg.py`).
- :mod:`.nid_diagnostics` — intensity-histogram / NID sanity checks
  (`scripts/computeNidForCloudAndImage.py`).
- :mod:`.trajectory_plot` — trajectory-vs-cloud visual check
  (`scripts/gen_reconstruct_pose_plots.py`), headless PNG output.

Each module is runnable: ``python -m pointcloudprocessor_tpu.tools.<name>``.
"""
