"""Reconstruction / trajectory visualization (headless-friendly).

The reference ships a moderngl+imgui live viewer
(/root/reference/mast3r_slam/visualization.py) rendering surfels, frustums
and graph edges. On a TPU host there is typically no GL stack, so this
module renders the same content offline with matplotlib: trajectory plots,
confidence-thresholded point-cloud projections, camera frustums and
factor-graph edges — written as PNGs during or after a run. The exported
PLY (io/export.py) remains the high-fidelity path for external viewers.
"""

from __future__ import annotations

import pathlib

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_trajectory(keyframes, out_path, gt_file=None):
    """Top-down + side trajectory plot from keyframe poses."""
    plt = _mpl()
    n = len(keyframes)
    T = np.asarray(keyframes.T_WC[:n])
    t = T[:, :3]
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    for ax, (i, j), name in zip(axes, [(0, 2), (0, 1)], ["x-z", "x-y"]):
        ax.plot(t[:, i], t[:, j], "b.-", ms=3, lw=0.8, label="estimate")
        if gt_file is not None:
            from .eval.ate import load_tum_trajectory

            _, gt_t, _ = load_tum_trajectory(gt_file)
            ax.plot(gt_t[:, i], gt_t[:, j], "g-", lw=0.8, label="gt")
        ax.set_xlabel(name.split("-")[0])
        ax.set_ylabel(name.split("-")[1])
        ax.axis("equal")
        ax.legend()
    fig.suptitle(f"trajectory ({n} keyframes)")
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def render_pointcloud(keyframes, out_path, c_conf_threshold=1.5,
                      max_points=400_000, factor_graph=None):
    """Orthographic scatter render of the fused world point cloud with
    frustum centers and graph edges (surfelmap.glsl stand-in)."""
    from .lie import sim3

    plt = _mpl()
    n = len(keyframes)
    pts_all, col_all = [], []
    avg_C = np.asarray(keyframes.average_confs()[:n])
    for i in range(n):
        pW = np.asarray(sim3.act(keyframes.T_WC[i], keyframes.X[i]))
        col = np.asarray(keyframes.uimg[i]).reshape(-1, 3)
        valid = avg_C[i].reshape(-1) > c_conf_threshold
        pts_all.append(pW[valid])
        col_all.append(col[valid])
    pts = np.concatenate(pts_all, 0) if pts_all else np.zeros((0, 3))
    cols = np.concatenate(col_all, 0) if col_all else np.zeros((0, 3))
    if len(pts) > max_points:
        sel = np.random.default_rng(0).choice(len(pts), max_points,
                                              replace=False)
        pts, cols = pts[sel], cols[sel]

    T = np.asarray(keyframes.T_WC[:n])
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    for ax, (i, j) in zip(axes, [(0, 2), (0, 1)]):
        if len(pts):
            ax.scatter(pts[:, i], pts[:, j], s=0.1, c=np.clip(cols, 0, 1),
                       linewidths=0)
        ax.plot(T[:, i], T[:, j], "r.-", ms=4, lw=1.0)
        if factor_graph is not None and factor_graph.n_edges:
            ii = np.asarray(factor_graph.ii[: factor_graph.n_edges])
            jj = np.asarray(factor_graph.jj[: factor_graph.n_edges])
            for a, b in zip(ii, jj):
                ax.plot([T[a, i], T[b, i]], [T[a, j], T[b, j]], "y-",
                        lw=0.4, alpha=0.5)
        ax.set_aspect("equal")
        ax.set_facecolor("black")
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def keyframe_mosaic(keyframes, out_path, max_tiles=16):
    """Grid of keyframe images (debug view)."""
    plt = _mpl()
    n = min(len(keyframes), max_tiles)
    if n == 0:
        return None
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for i in range(n):
        axes[i].imshow(np.clip(np.asarray(keyframes.uimg[i]), 0, 1))
        axes[i].set_title(f"kf {i}", fontsize=8)
    for ax in axes:
        ax.axis("off")
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def build_scene(keyframes, c_conf_threshold=1.5, max_points=600_000,
                factor_graph=None):
    """Assemble the world-space render scene from the keyframe store.

    Returns a dict with ``pts`` (N,3) f32 world points, ``cols`` (N,3) u8,
    ``lpts`` (M,3) f32 line-segment endpoints (frustums green, trajectory
    red, factor-graph edges yellow — the reference viewer's content,
    /root/reference/mast3r_slam/visualization.py:133-188), ``lcols`` (M,3)
    u8, ``center`` (3,) f32 and ``scale`` float. Shared by the static HTML
    export and the live server (viz_server.py).
    """
    from .lie import sim3

    n = len(keyframes)
    pts_all, col_all = [], []
    avg_C = np.asarray(keyframes.average_confs()[:n])
    per_kf = max(1, max_points // max(n, 1))
    for i in range(n):
        pW = np.asarray(sim3.act(keyframes.T_WC[i], keyframes.X[i]))
        col = np.asarray(keyframes.uimg[i]).reshape(-1, 3)
        valid = avg_C[i].reshape(-1) > c_conf_threshold
        p, c = pW[valid], col[valid]
        if len(p) > per_kf:   # even stride keeps spatial coverage
            step = len(p) // per_kf
            p, c = p[::step][:per_kf], c[::step][:per_kf]
        pts_all.append(p)
        col_all.append(c)
    pts = (np.concatenate(pts_all, 0) if pts_all
           else np.zeros((0, 3))).astype(np.float32)
    cols = np.concatenate(col_all, 0) if col_all else np.zeros((0, 3))
    cols = (np.clip(cols, 0, 1) * 255).astype(np.uint8)

    T = np.asarray(keyframes.T_WC[:n])
    # frustum wireframes (8 segments each) in world coords
    lines = []
    fr = np.array([[0, 0, 0], [-.5, -.375, 1], [.5, -.375, 1],
                   [.5, .375, 1], [-.5, .375, 1]]) * 0.15
    import jax.numpy as jnp
    fr_j = jnp.asarray(fr)
    for i in range(n):
        c = np.asarray(sim3.act(keyframes.T_WC[i], fr_j))
        for a, b in [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3),
                     (3, 4), (4, 1)]:
            lines.append((c[a], c[b], (0.2, 0.9, 0.2)))
    for i in range(1, n):
        lines.append((T[i - 1, :3], T[i, :3], (0.9, 0.2, 0.2)))
    if factor_graph is not None and factor_graph.n_edges:
        ii = np.asarray(factor_graph.ii[: factor_graph.n_edges])
        jj = np.asarray(factor_graph.jj[: factor_graph.n_edges])
        for a, b in zip(ii, jj):
            lines.append((T[a, :3], T[b, :3], (0.9, 0.9, 0.1)))

    lp = np.array([np.concatenate([a, b]) for a, b, _ in lines],
                  np.float32).reshape(-1, 3) if lines else np.zeros(
                      (0, 3), np.float32)
    lc = (np.array([[c, c] for _, _, c in lines], np.float32).reshape(-1, 3)
          if lines else np.zeros((0, 3), np.float32))
    center = (pts.mean(0) if len(pts) else np.zeros(3)).astype(np.float32)
    scale = float(np.percentile(np.linalg.norm(pts - center, axis=1), 90)
                  ) if len(pts) else 1.0
    return {"pts": pts, "cols": cols, "lpts": lp,
            "lcols": (lc * 255).astype(np.uint8), "center": center,
            "scale": max(scale, 1e-3)}


def export_html_viewer(keyframes, out_path, c_conf_threshold=1.5,
                       max_points=600_000, factor_graph=None):
    """Interactive WebGL point-cloud viewer in ONE self-contained HTML file.

    TPU-native stand-in for the reference's live moderngl window
    (/root/reference/mast3r_slam/visualization.py:98-380): the fused,
    confidence-thresholded world point cloud, keyframe frustums and
    factor-graph edges, with orbit/pan/zoom and a point-size slider —
    viewable in any browser with no server and no external JS deps.
    For a live view during a run, see viz_server.LiveViewer.
    """
    sc = build_scene(keyframes, c_conf_threshold, max_points, factor_graph)

    import base64

    def b64(a):
        return base64.b64encode(np.ascontiguousarray(a).tobytes()).decode()

    c = sc["center"]
    init = _STATIC_INIT_JS.replace("__NPTS__", str(len(sc["pts"])))
    init = init.replace("__PTS__", b64(sc["pts"]))
    init = init.replace("__COLS__", b64(sc["cols"]))
    init = init.replace("__LPTS__", b64(sc["lpts"]))
    init = init.replace("__LCOLS__", b64(sc["lcols"]))
    init = init.replace("__CENTER__", f"[{c[0]},{c[1]},{c[2]}]")
    init = init.replace("__SCALE__", f"{sc['scale']}")
    html = _VIEWER_HTML.replace("__EXTRA_HUD__", "")
    html = html.replace("__INIT_JS__", init)

    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(html)
    return out_path


def live_html(token=""):
    """Viewer page for the live server: same WebGL renderer, scene fetched
    from ``/scene`` on a poll loop, pause/step buttons POSTing to ``/ctrl``
    with the per-run control token (the reference viewer's pause/next UI,
    visualization.py:324-332)."""
    html = _VIEWER_HTML.replace(
        "__EXTRA_HUD__",
        '&nbsp; conf <input id="confs" type="range" min="0" max="5"'
        ' value="1.5" step="0.1">'
        '&nbsp; <button id="pauseb">pause</button>'
        '<button id="stepb">step</button>')
    return html.replace("__INIT_JS__",
                        _LIVE_INIT_JS.replace("__TOKEN__", token))


_VIEWER_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>mast3r_slam_tpu reconstruction</title>
<style>body{margin:0;background:#000;color:#ccc;font:12px monospace;overflow:hidden}
#hud{position:fixed;top:8px;left:8px;z-index:2;background:#000a;padding:6px}
canvas{display:block}</style></head><body>
<div id="hud"><span id="stat"></span> &nbsp; drag=orbit, shift-drag=pan, wheel=zoom
&nbsp; size <input id="psz" type="range" min="1" max="6" value="2" step="0.5">__EXTRA_HUD__</div>
<canvas id="c"></canvas>
<script>
"use strict";
function dec(b64){const s=atob(b64);const a=new Uint8Array(s.length);
for(let i=0;i<s.length;i++)a[i]=s.charCodeAt(i);return a;}
let NP=0, NL=0, center=[0,0,0], scale=1;
const cv=document.getElementById("c");
const gl=cv.getContext("webgl");
const vs=`attribute vec3 p;attribute vec3 col;uniform mat4 mvp;
uniform float psz;varying vec3 vc;
void main(){gl_Position=mvp*vec4(p,1.0);gl_PointSize=psz;vc=col;}`;
const fs=`precision mediump float;varying vec3 vc;
void main(){gl_FragColor=vec4(vc,1.0);}`;
function sh(t,s){const o=gl.createShader(t);gl.shaderSource(o,s);
gl.compileShader(o);return o;}
const pr=gl.createProgram();
gl.attachShader(pr,sh(gl.VERTEX_SHADER,vs));
gl.attachShader(pr,sh(gl.FRAGMENT_SHADER,fs));
gl.linkProgram(pr);gl.useProgram(pr);
const aP=gl.getAttribLocation(pr,"p"),aC=gl.getAttribLocation(pr,"col");
const uM=gl.getUniformLocation(pr,"mvp"),uS=gl.getUniformLocation(pr,"psz");
const bP=gl.createBuffer(),bC=gl.createBuffer(),
      bLP=gl.createBuffer(),bLC=gl.createBuffer();
let az=0.5,el=0.4,dist=3,tgt=[0,0,0];
function up(b,data){gl.bindBuffer(gl.ARRAY_BUFFER,b);
gl.bufferData(gl.ARRAY_BUFFER,data,gl.DYNAMIC_DRAW);}
function setScene(pts,cols,lpts,lcols,c,s,recenter){
NP=pts.length/3;NL=lpts.length/3;
up(bP,pts);up(bC,cols);up(bLP,lpts);up(bLC,lcols);
if(recenter){center=c;scale=s;dist=scale*3;tgt=center.slice();}}
function mat(){const w=cv.width,h=cv.height,f=1.5;const a=w/h;
const ca=Math.cos(az),sa=Math.sin(az),ce=Math.cos(el),se=Math.sin(el);
const eye=[tgt[0]+dist*ce*sa,tgt[1]+dist*se,tgt[2]+dist*ce*ca];
const zx=eye[0]-tgt[0],zy=eye[1]-tgt[1],zz=eye[2]-tgt[2];
const zl=Math.hypot(zx,zy,zz);const z=[zx/zl,zy/zl,zz/zl];
const x=[z[2],0,-z[0]];const xl=Math.hypot(...x);x[0]/=xl;x[1]/=xl;x[2]/=xl;
const y=[z[1]*x[2]-z[2]*x[1],z[2]*x[0]-z[0]*x[2],z[0]*x[1]-z[1]*x[0]];
const n=0.01*scale,fa=100*scale;
const view=[x[0],y[0],z[0],0,x[1],y[1],z[1],0,x[2],y[2],z[2],0,
-(x[0]*eye[0]+x[1]*eye[1]+x[2]*eye[2]),
-(y[0]*eye[0]+y[1]*eye[1]+y[2]*eye[2]),
-(z[0]*eye[0]+z[1]*eye[1]+z[2]*eye[2]),1];
const proj=[f/a,0,0,0, 0,f,0,0, 0,0,(fa+n)/(n-fa),-1, 0,0,2*fa*n/(n-fa),0];
const m=new Float32Array(16);
for(let i=0;i<4;i++)for(let j=0;j<4;j++){let s=0;
for(let k=0;k<4;k++)s+=view[i*4+k]*proj[k*4+j];m[i*4+j]=s;}
return m;}
function draw(){cv.width=innerWidth;cv.height=innerHeight;
gl.viewport(0,0,cv.width,cv.height);
gl.clearColor(0,0,0,1);gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
gl.enable(gl.DEPTH_TEST);
gl.uniformMatrix4fv(uM,false,mat());
gl.uniform1f(uS,parseFloat(document.getElementById("psz").value));
gl.bindBuffer(gl.ARRAY_BUFFER,bP);
gl.enableVertexAttribArray(aP);gl.vertexAttribPointer(aP,3,gl.FLOAT,false,0,0);
gl.bindBuffer(gl.ARRAY_BUFFER,bC);
gl.enableVertexAttribArray(aC);gl.vertexAttribPointer(aC,3,gl.UNSIGNED_BYTE,true,0,0);
gl.drawArrays(gl.POINTS,0,NP);
gl.bindBuffer(gl.ARRAY_BUFFER,bLP);gl.vertexAttribPointer(aP,3,gl.FLOAT,false,0,0);
gl.bindBuffer(gl.ARRAY_BUFFER,bLC);gl.vertexAttribPointer(aC,3,gl.UNSIGNED_BYTE,true,0,0);
gl.drawArrays(gl.LINES,0,NL);
requestAnimationFrame(draw);}
let drag=false,pan=false,lx=0,ly=0;
cv.onmousedown=e=>{drag=true;pan=e.shiftKey;lx=e.clientX;ly=e.clientY;};
onmouseup=()=>drag=false;
onmousemove=e=>{if(!drag)return;const dx=e.clientX-lx,dy=e.clientY-ly;
lx=e.clientX;ly=e.clientY;
if(pan){const s=dist*0.002;tgt[0]-=dx*s*Math.cos(az);tgt[2]+=dx*s*Math.sin(az);
tgt[1]+=dy*s;}else{az-=dx*0.005;el=Math.max(-1.5,Math.min(1.5,el+dy*0.005));}};
onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);};
__INIT_JS__
draw();
</script></body></html>
"""

_STATIC_INIT_JS = """
setScene(new Float32Array(dec("__PTS__").buffer),dec("__COLS__"),
new Float32Array(dec("__LPTS__").buffer),dec("__LCOLS__"),
__CENTER__,__SCALE__,true);
document.getElementById("stat").textContent="points: __NPTS__";
"""

# live mode: poll /scene (binary layout packed by viz_server.pack_scene),
# re-upload buffers, recenter only on the first scene; pause/step -> /ctrl
_LIVE_INIT_JS = """
let first=true;
async function poll(){
try{
const r=await fetch("/scene",{cache:"no-store"});
const b=await r.arrayBuffer();
const h=new Uint32Array(b,0,8);
const hf=new Float32Array(b,32,4);
const npts=h[2],nlines=h[3],nkf=h[4],frame=h[5],paused=h[6];
let off=48;
const pts=new Float32Array(b,off,npts*3);off+=npts*12;
const cols=new Uint8Array(b,off,npts*3);off+=npts*3;
off=(off+3)&~3;
const lpts=new Float32Array(b,off,nlines*3);off+=nlines*12;
const lcols=new Uint8Array(b,off,nlines*3);
setScene(pts,cols,lpts,lcols,[hf[0],hf[1],hf[2]],hf[3],first&&npts>0);
if(npts>0)first=false;   // keep recentering armed until a real scene lands
document.getElementById("stat").textContent=
"kf "+nkf+" frame "+frame+" pts "+npts;
document.getElementById("pauseb").textContent=paused?"resume":"pause";
}catch(e){}
setTimeout(poll,1500);}
poll();
const ctrl=q=>fetch("/ctrl?"+q+"&t=__TOKEN__",{method:"POST"});
document.getElementById("pauseb").onclick=()=>ctrl("toggle=1");
document.getElementById("stepb").onclick=()=>ctrl("step=1");
document.getElementById("confs").onchange=e=>ctrl("conf="+e.target.value);
"""
