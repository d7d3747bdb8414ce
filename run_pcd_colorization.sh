#!/bin/bash
# Canonical pipeline invocation — the rebuild of the reference's
# run_pcd_colorization.sh (resample VO odometry to image timestamps, then run
# the colorization/refinement pipeline).
set -euo pipefail

root_dir="${1:?usage: run_pcd_colorization.sh <dataset_root> [config.json]}"
config="${2:-}"

enableMLS="${ENABLE_MLS:-false}"
enableNIDOptimize="${ENABLE_NID:-true}"

# 1. Interpolate the VO pose track onto the image timestamps (produces
#    vo_interpolated_odom.txt, the pipeline's odometry input).
if [ -f "$root_dir/visual_odom_in_lidar_ts.txt" ]; then
  python -m pointcloudprocessor_tpu.tools.vo_interp \
      --odometry "$root_dir/visual_odom_in_lidar_ts.txt" \
      --timestamps "$root_dir/visual_odom.txt" \
      --output "$root_dir/vo_interpolated_odom.txt"
fi

# 2. Run the pipeline.
args=(
  --point_cloud_path "$root_dir/scans.pcd"
  --odometry_path "$root_dir/vo_interpolated_odom.txt"
  --images_folder "$root_dir/raw_images/"
  --output_path "$root_dir/"
)
[ -d "$root_dir/masks" ] && args+=(--mask_image_folder "$root_dir/masks/")
[ "$enableMLS" = "true" ] && args+=(--enableMLS)
[ "$enableNIDOptimize" = "true" ] && args+=(--enableNIDOptimize)
[ -n "$config" ] && args+=(--config "$config")

exec python -m pointcloudprocessor_tpu.cli "${args[@]}"
