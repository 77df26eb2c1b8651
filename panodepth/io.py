"""Host-side image IO and dataset filename conventions.

Replaces the reference's stb_image / OpenCV usage:

* 8/16-bit PNG/JPG load normalized to 0~1 floats
  (``EquirectangularMap::Load`` / ``PerspectiveMap::Load``,
  reference ``Depth.cpp:45-109, 277-355``);
* PFM load with optional vertical flip / minmax normalization / 10 m cap
  (``LoadPfm``, ``Depth.cpp:357-549``);
* 16-bit single-channel PNG save (``Save16BitPNG`` via cv::imwrite,
  ``Depth.cpp:27-32``) and 8-bit save (``Save8bit``, ``Depth.cpp:612-635``);
* the dataset filename conventions of the batch driver
  (``Main.cpp:496-587``).

A native C++ fast path for the hot formats lives in ``panodepth.utils.nativeio``
(used automatically when the shared library has been built).
"""

from __future__ import annotations

import os
import re
import struct
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from .utils import nativeio


# ---------------------------------------------------------------------------
# loading


def load_image01(filename: str, mono360: bool = False) -> np.ndarray:
    """Load an image as float32 0~1, shape (H, W) or (H, W, C).

    8-bit images divide by 255, 16-bit by 65535 (Depth.cpp:61-104).  ``.pfm``
    files follow EquirectangularMap::Load's dispatch (Depth.cpp:277-293):
    mono360 PFMs are flipped vertically and minmax-normalized, others are
    clamped at 0 and divided by 10 m.  PNGs decode through the native C++
    codec when built (same normalization), other formats through PIL.
    """
    if filename.lower().endswith(".pfm"):
        return load_pfm01(filename, flip_vertical=mono360, normalize=mono360)
    if filename.lower().endswith(".png") and nativeio.available():
        try:
            return nativeio.read_image_f32(filename)
        except IOError:
            # PNG variants the native codec rejects (palette, interlaced,
            # bit depth < 8): PIL decoded them before the library existed
            # and still does
            pass
    img = Image.open(filename)
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        out = arr.astype(np.float32) / 255.0
    elif arr.dtype in (np.uint16, np.int32, np.uint32):
        out = arr.astype(np.float32) / 65535.0
    else:
        out = arr.astype(np.float32)
    return out


def load_image_int(filename: str):
    """Integer-preserving load for transfer streaming: (array, scale).

    Returns the decoded uint8 or uint16 array with its 0~1 normalization
    divisor (255.0 / 65535.0), or ``None`` for formats without an exact
    integer representation (PFM floats).  ``array/scale`` equals
    :func:`load_image01` up to 1 f32 ulp; callers stream the integers to
    the device and normalize there (half/quarter the host->device bytes).
    """
    if filename.lower().endswith(".pfm"):
        return None
    arr = np.asarray(Image.open(filename))
    if arr.dtype == np.uint8:
        return arr, 255.0
    if arr.dtype == np.uint16:
        return arr, 65535.0
    if arr.dtype in (np.int32, np.uint32):
        return arr.astype(np.uint16), 65535.0
    return None


def load_pfm(filename: str) -> np.ndarray:
    """Raw PFM float array, shape (H, W) or (H, W, 3), file row order kept.

    Mirrors load_pfm (Depth.cpp:376-453) including endianness handling.
    """
    with open(filename, "rb") as fp:
        header = fp.readline().strip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"unsupported PFM type {header!r} in {filename}")
        dims = fp.readline().split()
        width, height = int(dims[0]), int(dims[1])
        scale = float(fp.readline().strip())
        data = np.frombuffer(fp.read(width * height * channels * 4),
                             dtype="<f4" if scale < 0 else ">f4")
    data = data.astype(np.float32).reshape(height, width, channels)
    return data[..., 0] if channels == 1 else data


def load_pfm01(filename: str, flip_vertical: bool, normalize: bool) -> np.ndarray:
    """LoadPfm semantics (Depth.cpp:455-549): flip / normalize / 10 m cap."""
    img = load_pfm(filename)
    if flip_vertical:
        img = img[::-1]
    if normalize:
        lo, hi = float(img.min()), float(img.max())
        img = (img - lo) / (hi - lo)
    else:
        img = np.minimum(np.maximum(img, 0.0) / 10.0, 10.0)
    return np.ascontiguousarray(img, np.float32)


def save_pfm(filename: str, img: np.ndarray) -> None:
    """Write a little-endian PFM (Pf/PF)."""
    img = np.asarray(img, np.float32)
    channels = 1 if img.ndim == 2 else img.shape[2]
    with open(filename, "wb") as fp:
        fp.write(b"PF\n" if channels == 3 else b"Pf\n")
        fp.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        fp.write(b"-1.0\n")
        fp.write(img.astype("<f4").tobytes())


# ---------------------------------------------------------------------------
# saving


def save_png16(filename: str, data: np.ndarray,
               level: Optional[int] = None) -> None:
    """16-bit single-channel PNG (Save16BitPNG, Depth.cpp:27-32).

    ``level`` is the deflate level (always lossless).  Default 1: ~3x
    faster encode than 6 for ~45 % larger files with the Up-filtered
    native codec — the right trade for a throughput pipeline; override
    per call or process-wide via ``PANODEPTH_PNG_LEVEL`` (CLI
    ``--png-level``) for archival output.
    """
    if level is None:
        level = int(os.environ.get("PANODEPTH_PNG_LEVEL", "1"))
    arr = np.ascontiguousarray(data, np.uint16)
    if nativeio.available():
        nativeio.write_png16(filename, arr, level=level)
        return
    # no mode= kwarg: PIL auto-selects I;16 for uint16 (the explicit
    # parameter is deprecated in Pillow >= 12)
    img = Image.fromarray(arr)
    img.save(filename, compress_level=max(0, min(9, level)))


def save_png8(filename: str, img01: np.ndarray) -> None:
    """8-bit PNG of a 0~1 float map (Save8bit, Depth.cpp:612-635)."""
    arr = (np.clip(img01, 0.0, 1.0) * 255.0).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(filename)


def save_jpg(filename: str, img01: np.ndarray, quality: int = 95) -> None:
    """JPEG of a 0~1 float image (stage-A view export, Main.cpp:320).

    2D input saves as 8-bit grayscale, (H, W, 3) as RGB.
    """
    arr = (np.clip(img01, 0.0, 1.0) * 255.0).astype(np.uint8)
    Image.fromarray(arr, mode="L" if arr.ndim == 2 else None).save(
        filename, quality=quality)


def to_uint16(img01: np.ndarray) -> np.ndarray:
    """C-cast quantization (ushort)(v * 65535) (Depth.cpp:1734)."""
    return (np.clip(img01, 0.0, 1.0) * 65535.0).astype(np.uint16)


# ---------------------------------------------------------------------------
# dataset filename conventions (reference Main.cpp:489-587)

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".pfm")


def list_images(folder: str) -> List[str]:
    """Sorted image files in a folder (AllFilesInFolder, Main.cpp:50-83)."""
    names = [
        os.path.join(folder, f)
        for f in sorted(os.listdir(folder))
        if f.lower().endswith(IMAGE_EXTS)
    ]
    return names


def filter_files(files: List[str], include=None, exclude=None,
                 limit=None, shard=None) -> List[str]:
    """Runtime form of the reference's compile-time "only do some / skip
    certain cases" blocks (Main.cpp:357-407): substring match on the full
    path, include then exclude, then ``shard`` ("i/n": round-robin slice
    ``files[i::n]`` for fleet runs — n machines each take a disjoint
    subset with zero coordination), then head-``limit`` (per shard).
    Shared by the file-based and on-device batch drivers so their filter
    semantics cannot drift."""
    if include:
        files = [f for f in files if any(s in f for s in include)]
    if exclude:
        files = [f for f in files if not any(s in f for s in exclude)]
    if shard is not None:
        try:
            i, n = (int(x) for x in str(shard).split("/"))
        except ValueError:
            raise ValueError(f"shard must look like 'i/n', got {shard!r}")
        if not (n > 0 and 0 <= i < n):
            raise ValueError(f"shard index out of range: {shard!r}")
        files = files[i::n]
    if limit is not None:
        files = files[:limit]
    return files


def raw_name(path: str) -> str:
    """Filename without directory and final extension (Main.cpp:452-454)."""
    base = os.path.basename(path)
    dot = base.rfind(".")
    return base if dot < 0 else base[:dot]


def baseline_filename(baseline_folder: str, rawname: str,
                      result_folder: str) -> str:
    """Per-method baseline naming (Main.cpp:500-516).

    The method is inferred from the *result* folder name, exactly like the
    reference: slicenet -> ``.jpg.slicenet.png``, unifuse -> ``.unifuse.jpg``,
    hohonet -> ``.depth.png``, default (bifuse) -> ``.jpg``.
    """
    rf = result_folder.lower()
    if "slicenet" in rf:
        suffix = ".jpg.slicenet.png"
    elif "unifuse" in rf:
        suffix = ".unifuse.jpg"
    elif "hohonet" in rf:
        suffix = ".depth.png"
    else:
        suffix = ".jpg"
    return os.path.join(baseline_folder, rawname + suffix)


def gt_filename(gt_folder: str, rawname: str, dataset: str = "matterport") -> str:
    """Ground-truth naming per dataset (Main.cpp:517-549)."""
    if dataset == "replica":
        return os.path.join(gt_folder, rawname.replace("rgb", "depth") + ".pfm")
    if dataset == "suncg":
        return os.path.join(
            gt_folder, (rawname + ".exr.png").replace("_color", "_depth")
        )
    # matterport default; stanford2d3d additionally swaps _rgb -> _depth
    name = rawname + ".png"
    name = name.replace("_rgb", "_depth")
    return os.path.join(gt_folder, name)


def pmap_filenames(views_folder: str, rawname: str, layout,
                   ext: str = ".jpg") -> List[str]:
    """Perspective map filenames ``<raw>.<aziL>_<aziR>_<zenT>_<zenD><ext>``.

    Matches the naming of Main.cpp:569-587 / SaveCubeMap (Main.cpp:313-315).
    """
    return [
        os.path.join(views_folder, f"{rawname}.{layout.view_tag(i)}{ext}")
        for i in range(layout.num_views)
    ]
