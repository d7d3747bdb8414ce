"""Static-HTML 2D-3D correspondence picker for the manual initial guess.

The reference's `InitialGuessManual`
(`PointCloudProcessor/include/vlcal/initial_guess_manual.hpp:29-355`) is an
interactive Iridescence viewer: right-click picks a 3D point (:174-185) and
a 2D pixel via an OpenCV window (:297-330); >= 3 pairs feed RANSAC + LSQ.
No display exists on a TPU host, so this tool closes the workflow gap
headlessly: it writes ONE self-contained HTML file (no network, no server)
that embeds each keyframe's image and its culled cloud projected into the
image (TURBO intensity colors, like `PointsColorUpdater`,
`points_color_updater.cpp:37-61`). Opened in any browser, it supports
zoom/pan, a blend slider (the `VisualLiDARVisualizer` slider,
`visual_lidar_visualizer.cpp:39-78`), click-to-pick alternating 3D point
(snaps to the nearest projected point, returning its CAMERA-FRAME
coordinates) and 2D pixel, and exports exactly the JSON schema consumed by
`pipeline/manual_guess.py`:

    {"<ts>": {"pixels": [[u, v], ...], "points": [[x, y, z], ...]}, ...}

Usage:
    python -m pointcloudprocessor_tpu.tools.pick_tool \
        --filtered-pcd-dir out/filtered_pcd --images-folder images \
        --intrinsic FX FY CX CY --output picks.html
    # open picks.html, pick >= 3 pairs per keyframe, Export JSON,
    # then: pcp-tpu ... --enableInitialGuessManual with
    #       correspondences_path=picks.json
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pcp-tpu pick tool</title>
<style>
 body {{ font-family: sans-serif; margin: 0; display: flex; height: 100vh; }}
 #side {{ width: 320px; padding: 10px; overflow-y: auto; background: #f4f4f4;
          border-right: 1px solid #ccc; flex-shrink: 0; }}
 #main {{ flex: 1; overflow: hidden; position: relative; background: #222; }}
 canvas {{ display: block; cursor: crosshair; }}
 .pair {{ font: 12px monospace; margin: 2px 0; }}
 .pair button {{ font-size: 10px; margin-left: 4px; }}
 #status {{ font: 12px monospace; color: #333; white-space: pre-wrap; }}
 label {{ font-size: 12px; display: block; margin-top: 8px; }}
 select, button {{ margin-top: 4px; }}
</style></head><body>
<div id="side">
  <h3>2D&ndash;3D pick tool</h3>
  <label>Keyframe
    <select id="kf"></select>
  </label>
  <label>Point blend <input type="range" id="blend" min="0" max="100" value="65"></label>
  <label>Point size <input type="range" id="psize" min="1" max="6" value="2"></label>
  <label><input type="checkbox" id="showpts" checked> show points</label>
  <p id="status">Click = pick 3D point (snaps to nearest projected point).
Shift+Click = pick 2D pixel (exact).
Picks alternate 3D &rarr; 2D into pairs. Wheel = zoom, drag = pan.</p>
  <div id="pairs"></div>
  <button id="undo">Undo last</button>
  <button id="clear">Clear keyframe</button>
  <hr>
  <button id="export">Export JSON</button>
  <textarea id="out" rows="8" style="width:100%; font: 10px monospace;"></textarea>
</div>
<div id="main"><canvas id="cv"></canvas></div>
<script>
const DATA = {data_json};
const kfSel = document.getElementById('kf');
Object.keys(DATA).forEach(ts => {{
  const o = document.createElement('option'); o.value = ts; o.textContent = ts;
  kfSel.appendChild(o);
}});
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
let img = new Image(), view = {{x: 0, y: 0, s: 1}}, pending3d = null;
const picks = {{}};  // ts -> [{{px:[u,v], pt:[x,y,z]}}]
Object.keys(DATA).forEach(ts => picks[ts] = []);

function cur() {{ return DATA[kfSel.value]; }}
function resize() {{
  const m = document.getElementById('main');
  cv.width = m.clientWidth; cv.height = m.clientHeight; draw();
}}
window.addEventListener('resize', resize);

function turbo(t) {{  // compact TURBO approximation
  const r = Math.round(255*Math.min(1, Math.max(0, 1.61 - Math.abs(4*t - 2.92))));
  const g = Math.round(255*Math.min(1, Math.max(0, 1.49 - Math.abs(4*t - 1.95))));
  const b = Math.round(255*Math.min(1, Math.max(0, 1.52 - Math.abs(4*t - 0.91))));
  return `rgb(${{r}},${{g}},${{b}})`;
}}
function draw() {{
  ctx.setTransform(1,0,0,1,0,0);
  ctx.clearRect(0,0,cv.width,cv.height);
  ctx.setTransform(view.s,0,0,view.s,view.x,view.y);
  ctx.drawImage(img, 0, 0);
  const d = cur(), blend = document.getElementById('blend').value/100.0;
  const ps = +document.getElementById('psize').value / view.s;
  if (document.getElementById('showpts').checked) {{
    ctx.globalAlpha = blend;
    for (let i = 0; i < d.u.length; i++) {{
      ctx.fillStyle = turbo(d.i[i]);
      ctx.fillRect(d.u[i]-ps/2, d.v[i]-ps/2, ps, ps);
    }}
    ctx.globalAlpha = 1.0;
  }}
  const pp = picks[kfSel.value];
  ctx.font = `${{14/view.s}}px sans-serif`;
  pp.forEach((pr, idx) => {{
    if (pr.proj) {{ ctx.strokeStyle = '#0f0'; cross(pr.proj, ps*3); label(idx+1, pr.proj); }}
    if (pr.px) {{ ctx.strokeStyle = '#ff0'; cross(pr.px, ps*3); label(idx+1, pr.px); }}
    if (pr.proj && pr.px) {{
      ctx.strokeStyle = '#0ff'; ctx.beginPath();
      ctx.moveTo(pr.proj[0], pr.proj[1]); ctx.lineTo(pr.px[0], pr.px[1]); ctx.stroke();
    }}
  }});
  if (pending3d) {{ ctx.strokeStyle = '#f0f'; cross(pending3d.proj, ps*4); }}
  function cross(p, r) {{
    ctx.lineWidth = 1.5/view.s; ctx.beginPath();
    ctx.moveTo(p[0]-r, p[1]); ctx.lineTo(p[0]+r, p[1]);
    ctx.moveTo(p[0], p[1]-r); ctx.lineTo(p[0], p[1]+r); ctx.stroke();
  }}
  function label(n, p) {{ ctx.fillStyle = '#fff'; ctx.fillText(n, p[0]+4/view.s, p[1]-4/view.s); }}
}}
function toImage(e) {{
  const r = cv.getBoundingClientRect();
  return [(e.clientX - r.left - view.x)/view.s, (e.clientY - r.top - view.y)/view.s];
}}
let dragging = null;
cv.addEventListener('mousedown', e => dragging = {{x: e.clientX, y: e.clientY, moved: false}});
cv.addEventListener('mousemove', e => {{
  if (!dragging) return;
  const dx = e.clientX - dragging.x, dy = e.clientY - dragging.y;
  if (Math.abs(dx) + Math.abs(dy) > 3) dragging.moved = true;
  view.x += dx; view.y += dy; dragging.x = e.clientX; dragging.y = e.clientY; draw();
}});
cv.addEventListener('mouseup', e => {{
  const wasDrag = dragging && dragging.moved; dragging = null;
  if (wasDrag) return;
  const [u, v] = toImage(e);
  if (e.shiftKey) {{  // 2D pixel pick
    if (!pending3d) {{ setStatus('Pick the 3D point first (plain click).'); return; }}
    picks[kfSel.value].push({{proj: pending3d.proj, pt: pending3d.pt, px: [u, v]}});
    pending3d = null; renderPairs(); draw();
  }} else {{          // 3D point pick: snap to nearest projected point
    const d = cur(); let best = -1, bd = 1e18;
    for (let i = 0; i < d.u.length; i++) {{
      const dd = (d.u[i]-u)**2 + (d.v[i]-v)**2;
      if (dd < bd) {{ bd = dd; best = i; }}
    }}
    if (best < 0 || Math.sqrt(bd) > 30/view.s) {{ setStatus('No projected point near click.'); return; }}
    pending3d = {{proj: [d.u[best], d.v[best]], pt: [d.x[best], d.y[best], d.z[best]]}};
    setStatus(`3D pick: (${{pending3d.pt.map(a=>a.toFixed(3)).join(', ')}})\\nNow Shift+Click the matching pixel.`);
    draw();
  }}
}});
cv.addEventListener('wheel', e => {{
  e.preventDefault();
  const f = e.deltaY < 0 ? 1.2 : 1/1.2, [u, v] = toImage(e);
  view.s *= f; view.x -= u*(f-1)*view.s/f; view.y -= v*(f-1)*view.s/f; draw();
}});
function setStatus(s) {{ document.getElementById('status').textContent = s; }}
function renderPairs() {{
  const div = document.getElementById('pairs'); div.innerHTML = '';
  picks[kfSel.value].forEach((pr, i) => {{
    const el = document.createElement('div'); el.className = 'pair';
    el.textContent = `#${{i+1}} px(${{pr.px[0].toFixed(1)}},${{pr.px[1].toFixed(1)}}) ` +
                     `pt(${{pr.pt.map(a=>a.toFixed(2)).join(',')}})`;
    const b = document.createElement('button'); b.textContent = 'x';
    b.onclick = () => {{ picks[kfSel.value].splice(i,1); renderPairs(); draw(); }};
    el.appendChild(b); div.appendChild(el);
  }});
}}
document.getElementById('undo').onclick = () => {{
  if (pending3d) pending3d = null; else picks[kfSel.value].pop();
  renderPairs(); draw();
}};
document.getElementById('clear').onclick = () => {{
  picks[kfSel.value] = []; pending3d = null; renderPairs(); draw();
}};
document.getElementById('export').onclick = () => {{
  const out = {{}};
  for (const ts in picks) {{
    if (picks[ts].length === 0) continue;
    out[ts] = {{pixels: picks[ts].map(p => p.px), points: picks[ts].map(p => p.pt)}};
  }}
  const s = JSON.stringify(out, null, 1);
  document.getElementById('out').value = s;
  const a = document.createElement('a');
  a.href = URL.createObjectURL(new Blob([s], {{type: 'application/json'}}));
  a.download = 'picks.json'; a.click();
}};
['blend','psize','showpts'].forEach(id =>
  document.getElementById(id).addEventListener('input', draw));
function loadKf() {{
  img = new Image();
  img.onload = () => {{ view = {{x: 0, y: 0, s: Math.min(cv.width/img.width, cv.height/img.height)}}; draw(); }};
  img.src = cur().image;
  pending3d = null; renderPairs();
}}
kfSel.addEventListener('change', loadKf);
resize(); loadKf();
</script></body></html>
"""


def build_keyframe_entry(camera, cloud_path: str, image_path: str, max_points: int):
    """Project one culled cloud into its image; return the embed dict.

    Culled clouds (`filtered_pcd/<ts>_beforeNID.pcd`) are already in the
    keyframe CAMERA frame (the frame `manual_guess.py` expects picked points
    in), so projection is the bare camera model.
    """
    import jax.numpy as jnp

    from ..io import pcd
    from ..models import camera as cam

    data = pcd.read(cloud_path)
    pts = np.asarray(data.points, np.float32)
    inten = (
        np.asarray(data.intensity, np.float32)
        if data.intensity is not None
        else np.zeros(len(pts), np.float32)
    )
    lo, hi = float(inten.min()), float(inten.max())
    inten = (inten - lo) / max(hi - lo, 1e-12)

    uv = np.asarray(cam.project(camera, jnp.asarray(pts)))
    ok = (
        (pts[:, 2] > 0)
        & (uv[:, 0] >= 0) & (uv[:, 0] < camera.width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < camera.height)
    )
    idx = np.flatnonzero(ok)
    if len(idx) > max_points:
        idx = idx[np.linspace(0, len(idx) - 1, max_points).astype(np.int64)]

    with open(image_path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode("ascii")
    ext = os.path.splitext(image_path)[1].lstrip(".").lower() or "jpeg"
    ext = {"jpg": "jpeg"}.get(ext, ext)
    r3 = lambda a: [round(float(x), 3) for x in a]
    return {
        "image": f"data:image/{ext};base64,{b64}",
        "u": r3(uv[idx, 0]),
        "v": r3(uv[idx, 1]),
        "x": r3(pts[idx, 0]),
        "y": r3(pts[idx, 1]),
        "z": r3(pts[idx, 2]),
        "i": [round(float(x), 3) for x in inten[idx]],
    }


def generate(
    filtered_pcd_dir: str,
    images_folder: str,
    intrinsic,
    distortion,
    output: str,
    max_points: int = 20000,
    width: int = 0,
    height: int = 0,
) -> list[str]:
    """Write the self-contained picker HTML; returns the keyframe ts list."""
    from ..models import camera as cam

    entries = {}
    ts_list = []
    for name in sorted(os.listdir(filtered_pcd_dir)):
        if not name.endswith("_beforeNID.pcd"):
            continue
        ts = name[: -len("_beforeNID.pcd")]
        img_path = None
        for ext in (".jpg", ".jpeg", ".png"):
            p = os.path.join(images_folder, ts + ext)
            if os.path.exists(p):
                img_path = p
                break
        if img_path is None:
            print(f"# skipping {ts}: no image in {images_folder}", file=sys.stderr)
            continue
        if not (width and height):
            from ..io import images as img_io

            h, w = img_io.load_rgb(img_path).shape[:2]
        else:
            w, h = width, height
        camera = cam.create_camera("pinhole", intrinsic, distortion, w, h)
        entries[ts] = build_keyframe_entry(
            camera, os.path.join(filtered_pcd_dir, name), img_path, max_points
        )
        ts_list.append(ts)

    if not entries:
        raise FileNotFoundError(
            f"no <ts>_beforeNID.pcd with matching images under {filtered_pcd_dir}"
        )
    html = _PAGE.format(data_json=json.dumps(entries, separators=(",", ":")))
    with open(output, "w") as f:
        f.write(html)
    return ts_list


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="static-HTML 2D-3D pick tool")
    ap.add_argument("--filtered-pcd-dir", required=True,
                    help="pipeline output dir with <ts>_beforeNID.pcd files")
    ap.add_argument("--images-folder", required=True)
    ap.add_argument("--intrinsic", type=float, nargs=4, required=True,
                    metavar=("FX", "FY", "CX", "CY"))
    ap.add_argument("--distortion", type=float, nargs=5, default=[0, 0, 0, 0, 0])
    ap.add_argument("--width", type=int, default=0, help="override image width")
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--max-points", type=int, default=20000,
                    help="max embedded projected points per keyframe")
    ap.add_argument("--output", required=True, help="output .html path")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (host-side tool: projection of a few "
                    "thousand points — CPU by default, the TPU tunnel costs "
                    "seconds per eager dispatch)")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    ts = generate(
        args.filtered_pcd_dir, args.images_folder, args.intrinsic,
        args.distortion, args.output, args.max_points, args.width, args.height,
    )
    print(f"{args.output}: {len(ts)} keyframes ({', '.join(ts)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
