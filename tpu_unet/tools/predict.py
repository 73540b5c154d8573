"""Prediction drivers — the predict.py mode dispatcher as functions.

Parity target: predict.py:13-194 (modes: predict, dir_predict, video, fps,
export).  Script-style mode switching becomes plain functions.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
from PIL import Image


def predict_dir(wrapper, in_dir: str, out_dir: str, save_npy: bool = False,
                limit: Optional[int] = None):
    """Batch over a folder, save seg_*.jpg (+ optional .npy prob dumps)
    (reference: predict.py:77-112, :166-178)."""
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(f for f in os.listdir(in_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if limit:
        names = names[:limit]
    for name in names:
        image = Image.open(os.path.join(in_dir, name))
        out = wrapper.detect_image(image)
        out.save(os.path.join(out_dir, "seg_" + os.path.splitext(name)[0] + ".jpg"))
        if save_npy:
            png = wrapper.get_miou_png(image)
            np.save(os.path.join(out_dir, "seg_" + os.path.splitext(name)[0]),
                    np.asarray(png))
    return len(names)


def predict_dir_batched(wrapper, in_dir: str, out_dir: str,
                        batch_size: int = 32, n_threads: int = 8,
                        limit: Optional[int] = None):
    """High-throughput folder segmentation: native C++ letterbox decode →
    fixed-shape TPU batches → class-index PNGs.

    This is the production path the reference lacks (predict.py loops
    detect_image one image at a time); the native loader + one jitted batch
    graph keep the MXU fed.
    """
    import numpy as np

    from tpu_unet.data.native import load_letterbox_batch

    import concurrent.futures as cf

    os.makedirs(out_dir, exist_ok=True)
    names = sorted(f for f in os.listdir(in_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if limit:
        names = names[:limit]
    h, w = wrapper.input_shape

    def load_chunk(chunk):
        paths = [os.path.join(in_dir, n) for n in chunk]
        batch, _, _ = load_letterbox_batch(paths, h, w, n_threads)
        if len(chunk) < batch_size:  # pad to the compiled shape
            pad = np.zeros((batch_size - len(chunk), h, w, 3), np.uint8)
            batch = np.concatenate([batch, pad])
        return batch

    chunks = [names[i:i + batch_size]
              for i in range(0, len(names), batch_size)]
    done = 0
    # double-buffered: decode chunk i+1 on host while the TPU runs chunk i
    with cf.ThreadPoolExecutor(1) as pool:
        nxt = pool.submit(load_chunk, chunks[0]) if chunks else None
        for ci, chunk in enumerate(chunks):
            batch = nxt.result()
            if ci + 1 < len(chunks):
                nxt = pool.submit(load_chunk, chunks[ci + 1])
            masks = wrapper.batch_infer(batch)[: len(chunk)]
            for name, mask in zip(chunk, masks):
                stem = os.path.splitext(name)[0]
                Image.fromarray(mask.astype(np.uint8)).save(
                    os.path.join(out_dir, stem + ".png"))
            done += len(chunk)
    return done


def predict_video(wrapper, video_path=0, video_save_path: str = "",
                  video_fps: float = 25.0, max_frames: Optional[int] = None):
    """Per-frame detect_image with running-average FPS overlay
    (reference: predict.py:115-159)."""
    import cv2

    capture = cv2.VideoCapture(video_path)
    out = None
    if video_save_path:
        fourcc = cv2.VideoWriter_fourcc(*"XVID")
        size = (int(capture.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(capture.get(cv2.CAP_PROP_FRAME_HEIGHT)))
        out = cv2.VideoWriter(video_save_path, fourcc, video_fps, size)
    fps = 0.0
    frames = 0
    while True:
        t1 = time.time()
        ref, frame = capture.read()
        if not ref:
            break
        frame_rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        result = np.array(wrapper.detect_image(Image.fromarray(frame_rgb)))
        result = cv2.cvtColor(result, cv2.COLOR_RGB2BGR)
        fps = (fps + (1.0 / max(time.time() - t1, 1e-6))) / 2
        result = cv2.putText(result, f"fps= {fps:.2f}", (0, 40),
                             cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 255, 0), 2)
        if out is not None:
            out.write(result)
        frames += 1
        if max_frames and frames >= max_frames:
            break
    capture.release()
    if out is not None:
        out.release()
    return frames, fps


def predict_video_batched(wrapper, video_path, video_save_path: str,
                          batch_size: int = 8, video_fps: float = 25.0,
                          max_frames: Optional[int] = None,
                          alpha: float = 0.7):
    """Streaming video inference as a pipelined TPU graph (the BASELINE
    'video mode as a pipelined jit' config): frames are letterboxed on
    host in a reader thread (cv2 bilinear + gray canvas — the same geometry
    as the training letterbox; the per-frame ``predict_video`` path keeps
    PIL BICUBIC exactness), run through one fixed-shape forward+argmax
    batch graph, and written back at the original size.

    When the frame size equals the model size the palette+blend render runs
    on device in the fused Pallas kernel.
    """
    import concurrent.futures as cf

    import cv2
    import jax
    import numpy as np

    h, w = wrapper.input_shape
    capture = cv2.VideoCapture(video_path)
    ow = int(capture.get(cv2.CAP_PROP_FRAME_WIDTH))
    oh = int(capture.get(cv2.CAP_PROP_FRAME_HEIGHT))
    out = cv2.VideoWriter(video_save_path, cv2.VideoWriter_fourcc(*"XVID"),
                          video_fps, (ow, oh))
    colors = np.asarray(wrapper.colors, np.uint8)
    on_tpu = jax.default_backend() in ("tpu", "axon")

    scale = min(w / ow, h / oh)
    nw, nh = int(ow * scale), int(oh * scale)
    dx, dy = (w - nw) // 2, (h - nh) // 2

    def letterbox(frame):
        resized = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.full((h, w, 3), 128, np.uint8)
        canvas[dy:dy + nh, dx:dx + nw] = resized
        return canvas

    def read_batch():
        frames = []
        while len(frames) < batch_size:
            ok, frame = capture.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        return frames

    def render(frames, masks):
        for frame, mask in zip(frames, masks):
            # crop the gray bars, then resize the mask to the frame size
            content = mask[dy:dy + nh, dx:dx + nw].astype(np.uint8)
            mask_full = cv2.resize(content, (ow, oh),
                                   interpolation=cv2.INTER_NEAREST)
            seg = colors[mask_full % len(colors)]
            blended = (frame.astype(np.float32) * (1 - alpha)
                       + seg.astype(np.float32) * alpha)
            out.write(cv2.cvtColor(np.round(blended).astype(np.uint8),
                                   cv2.COLOR_RGB2BGR))

    done = 0
    with cf.ThreadPoolExecutor(1) as pool:
        nxt = pool.submit(read_batch)
        while True:
            frames = nxt.result()
            if not frames:
                break
            nxt = pool.submit(read_batch)  # overlap decode with TPU compute
            batch = np.stack([letterbox(f) for f in frames])
            if len(frames) < batch_size:
                pad = np.zeros((batch_size - len(frames), h, w, 3), np.uint8)
                batch = np.concatenate([batch, pad])
            masks = wrapper.batch_infer(batch)[: len(frames)]
            if on_tpu and (oh, ow) == (h, w):
                # frame size == model size → the whole render happens on
                # device in the fused Pallas palette+blend kernel
                from tpu_unet.kernels.postprocess import fused_mask_palette

                blended = np.asarray(fused_mask_palette(
                    masks, np.stack(frames), wrapper.colors, alpha))
                for fr in blended:
                    out.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
            else:
                render(frames, masks)
            done += len(frames)
            if max_frames and done >= max_frames:
                break
    capture.release()
    out.release()
    return done


def fps_test(wrapper, image_path: str, test_interval: int = 100):
    """reference: predict.py:161-164."""
    image = Image.open(image_path)
    tact = wrapper.get_FPS(image, test_interval)
    print(f"{tact:.6f} seconds, {1 / tact:.2f} FPS, @batch_size 1")
    return 1.0 / tact
