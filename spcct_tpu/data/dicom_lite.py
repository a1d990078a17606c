# dicom_lite.py — minimal pure-numpy DICOM codec (no pydicom dependency).
#
# The reference reads multi-frame DICOM stacks via pydicom.dcmread().pixel_array
# (helpers.py:190-193). pydicom is not available in every deployment, so this
# module implements the small subset the SPCCT data actually needs:
#   * read: uncompressed grayscale pixel data, explicit OR implicit VR little
#     endian, single- or multi-frame, 8/16-bit signed/unsigned.
#   * write: explicit VR little endian multi-frame files (used by tests to
#     round-trip the loader without real data, and handy as a converter).
# loader.py prefers pydicom when importable and falls back to read_dicom here.
#
# Format notes (DICOM PS3.10/PS3.5): 128-byte preamble + "DICM", file-meta
# group (0002,xxxx) always explicit-VR little-endian, then the dataset in the
# transfer syntax declared by (0002,0010). Long VRs (OB/OW/OF/SQ/UT/UN) carry
# 2 reserved bytes + 4-byte length; short VRs a 2-byte length.
from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import numpy as np

EXPLICIT_LE = "1.2.840.10008.1.2.1"
IMPLICIT_LE = "1.2.840.10008.1.2"
_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"}


# ─────────────────────────────────────────────────────────────
# Writer (explicit VR little endian)
# ─────────────────────────────────────────────────────────────
def _el(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr not in (b"UI", b"IS", b"DS", b"LO", b"SH", b"CS") else b" "
    head = struct.pack("<HH", group, elem) + vr
    if vr in _LONG_VRS:
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def write_dicom(path: Union[str, Path], frames: np.ndarray,
                rescale: Optional[Tuple[float, float]] = None) -> None:
    """Write (N,H,W) or (H,W) integer frames as one multi-frame DICOM file.

    Accepts uint8/int8/uint16/int16. `rescale` optionally writes
    (slope, intercept) tags — note the reference pipeline reads the RAW stored
    values (pydicom .pixel_array does not apply rescale), so these tags are
    informational only.
    """
    frames = np.asarray(frames)
    if frames.ndim == 2:
        frames = frames[None]
    if frames.ndim != 3:
        raise ValueError(f"expected (N,H,W) or (H,W), got {frames.shape}")
    if frames.dtype not in (np.uint8, np.int8, np.uint16, np.int16):
        raise ValueError(f"unsupported dtype {frames.dtype} (use int/uint 8/16)")
    n, rows, cols = frames.shape
    bits = frames.dtype.itemsize * 8
    signed = frames.dtype in (np.int8, np.int16)

    meta_body = (
        _el(0x0002, 0x0001, b"OB", b"\x00\x01")
        + _el(0x0002, 0x0002, b"UI", b"1.2.840.10008.5.1.4.1.1.7")  # SC Image
        + _el(0x0002, 0x0003, b"UI", b"1.2.826.0.1.3680043.9.9999.1")
        + _el(0x0002, 0x0010, b"UI", EXPLICIT_LE.encode())
    )
    meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body

    px = np.ascontiguousarray(frames, dtype=frames.dtype.newbyteorder("<")).tobytes()
    body = (
        _el(0x0008, 0x0016, b"UI", b"1.2.840.10008.5.1.4.1.1.7")
        + _el(0x0028, 0x0002, b"US", struct.pack("<H", 1))           # samples/px
        + _el(0x0028, 0x0004, b"CS", b"MONOCHROME2")
        + _el(0x0028, 0x0008, b"IS", str(n).encode())                # NumberOfFrames
        + _el(0x0028, 0x0010, b"US", struct.pack("<H", rows))
        + _el(0x0028, 0x0011, b"US", struct.pack("<H", cols))
        + _el(0x0028, 0x0100, b"US", struct.pack("<H", bits))        # BitsAllocated
        + _el(0x0028, 0x0101, b"US", struct.pack("<H", bits))        # BitsStored
        + _el(0x0028, 0x0102, b"US", struct.pack("<H", bits - 1))    # HighBit
        + _el(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0))
    )
    if rescale is not None:
        slope, intercept = rescale
        body += _el(0x0028, 0x1052, b"DS", repr(float(intercept)).encode())
        body += _el(0x0028, 0x1053, b"DS", repr(float(slope)).encode())
    body += _el(0x7FE0, 0x0010, b"OW", px)

    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


# ─────────────────────────────────────────────────────────────
# Reader (explicit or implicit VR little endian, uncompressed)
# ─────────────────────────────────────────────────────────────
def _parse_elements(buf: bytes, pos: int, end: int, explicit: bool) -> Dict[Tuple[int, int], bytes]:
    out: Dict[Tuple[int, int], bytes] = {}
    while pos + 8 <= end:
        group, elem = struct.unpack_from("<HH", buf, pos)
        pos += 4
        if explicit:
            vr = buf[pos:pos + 2]
            if vr in _LONG_VRS:
                length = struct.unpack_from("<I", buf, pos + 4)[0]
                pos += 8
            else:
                length = struct.unpack_from("<H", buf, pos + 2)[0]
                pos += 4
        else:
            length = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        if length == 0xFFFFFFFF:
            raise ValueError("undefined-length elements (encapsulated/compressed "
                             "pixel data or sequences) are not supported")
        out[(group, elem)] = buf[pos:pos + length]
        pos += length
    return out


def read_dicom(path: Union[str, Path]) -> np.ndarray:
    """Read one uncompressed little-endian DICOM file → pixel array.

    Returns (N,H,W) for multi-frame files, (H,W) for single-frame — the same
    contract as pydicom's Dataset.pixel_array that the reference relies on
    (helpers.py:190-193).
    """
    buf = Path(path).read_bytes()
    if buf[128:132] == b"DICM":
        pos = 132
        # file-meta group is always explicit LE; read it to find the syntax
        meta_len = struct.unpack_from("<I", buf, pos + 8)[0]
        meta_end = pos + 12 + meta_len
        meta = _parse_elements(buf, pos, meta_end, explicit=True)
        syntax = meta.get((0x0002, 0x0010), EXPLICIT_LE.encode()).rstrip(b"\x00 ").decode()
        pos = meta_end
    else:
        pos, syntax = 0, IMPLICIT_LE  # raw datasets are implicit LE by convention
    if syntax not in (EXPLICIT_LE, IMPLICIT_LE):
        raise ValueError(f"unsupported transfer syntax {syntax} "
                         "(only uncompressed little-endian)")
    el = _parse_elements(buf, pos, len(buf), explicit=(syntax == EXPLICIT_LE))

    def us(tag, default=None):
        v = el.get(tag)
        if v is None:
            return default
        return struct.unpack("<H", v[:2])[0]

    rows, cols = us((0x0028, 0x0010)), us((0x0028, 0x0011))
    if rows is None or cols is None:
        raise ValueError("missing Rows/Columns")
    bits = us((0x0028, 0x0100), 16)
    signed = us((0x0028, 0x0103), 0) == 1
    nf_raw = el.get((0x0028, 0x0008), b"1").strip(b"\x00 ")
    n = int(nf_raw or b"1")
    px = el.get((0x7FE0, 0x0010))
    if px is None:
        raise ValueError("missing PixelData")
    dtype = {(8, False): np.uint8, (8, True): np.int8,
             (16, False): np.uint16, (16, True): np.int16}[(bits, signed)]
    arr = np.frombuffer(px, dtype=np.dtype(dtype).newbyteorder("<"),
                        count=n * rows * cols).reshape(n, rows, cols)
    return arr[0] if n == 1 else arr
