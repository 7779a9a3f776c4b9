"""Annotate a frame sequence with text and assemble a video/gif.

Equivalent of ref codes/scripts/make_gif_video.py: draws a caption onto
each frame (cv2.putText), optionally crops/enlarges, writes the
annotated frames, then shells out to ffmpeg (if present) for the final
mp4/gif — same division of labor as the reference, which also defers
gif quality to external tools.

Usage:
  python scripts/make_gif_video.py 'frames/*.png' out_dir \
      --text "ESRGAN 4x" --fps 10 --video out.mp4
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import subprocess


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pattern")
    p.add_argument("save")
    p.add_argument("--text", default="")
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--video", default=None,
                   help="output mp4/gif path (needs ffmpeg)")
    args = p.parse_args()

    import cv2

    files = sorted(glob.glob(args.pattern))
    if not files:
        raise SystemExit(f"nothing matches {args.pattern}")
    os.makedirs(args.save, exist_ok=True)
    for i, src in enumerate(files):
        img = cv2.imread(src, cv2.IMREAD_COLOR)
        if img is None:
            print(f"skip (unreadable): {src}")
            continue
        if args.scale != 1.0:
            img = cv2.resize(img, None, fx=args.scale, fy=args.scale,
                             interpolation=cv2.INTER_NEAREST)
        if args.text:
            cv2.putText(img, args.text, (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2,
                        cv2.LINE_AA)
        cv2.imwrite(os.path.join(args.save, f"frame_{i:05d}.png"), img)
    print(f"annotated {len(files)} frames -> {args.save}")

    if args.video:
        if shutil.which("ffmpeg") is None:
            raise SystemExit("ffmpeg not found — annotated frames were "
                             "written; assemble them externally")
        cmd = ["ffmpeg", "-y", "-framerate", str(args.fps), "-i",
               os.path.join(args.save, "frame_%05d.png")]
        if args.video.endswith(".gif"):
            cmd += ["-filter_complex",
                    "[0:v]split[a][b];[a]palettegen[p];[b][p]paletteuse"]
        else:
            cmd += ["-c:v", "libx264", "-pix_fmt", "yuv420p"]
        cmd.append(args.video)
        subprocess.run(cmd, check=True)
        print(f"-> {args.video}")


if __name__ == "__main__":
    main()
