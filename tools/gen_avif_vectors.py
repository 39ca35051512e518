#!/usr/bin/env python3
"""Produce REAL AVIF/HEIC validation files via the box's libheif
(linked against aom/x265 encoders), the libwebp-ctypes method: the
committed vectors pin the ISOBMFF census (brand, ispe geometry, codec
config box, item count) against real encoder output. Deterministic
input: a small gradient+checker luma plane."""
import ctypes, sys, os

lib = ctypes.CDLL("libheif.so.1")


class HeifError(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


for name, res in [
    ("heif_context_alloc", ctypes.c_void_p),
    ("heif_context_get_encoder_for_format", HeifError),
    ("heif_image_create", HeifError),
    ("heif_image_add_plane", HeifError),
    ("heif_image_get_plane", ctypes.POINTER(ctypes.c_uint8)),
    ("heif_context_encode_image", HeifError),
    ("heif_context_write_to_file", HeifError),
    ("heif_encoder_set_lossy_quality", HeifError),
]:
    getattr(lib, name).restype = res
lib.heif_context_alloc.argtypes = []
lib.heif_context_get_encoder_for_format.argtypes = [
    ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)]
lib.heif_image_create.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_void_p)]
lib.heif_image_add_plane.argtypes = [
    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
lib.heif_image_get_plane.argtypes = [
    ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
lib.heif_context_encode_image.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_void_p)]
lib.heif_context_write_to_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
lib.heif_encoder_set_lossy_quality.argtypes = [ctypes.c_void_p, ctypes.c_int]

HEIF_COMPRESSION_HEVC = 1
HEIF_COMPRESSION_AV1 = 4
HEIF_COLORSPACE_YCBCR = 0
HEIF_CHROMA_420 = 1
HEIF_CHANNEL_Y, HEIF_CHANNEL_CB, HEIF_CHANNEL_CR = 0, 1, 2


def check(err, what):
    if err.code != 0:
        raise RuntimeError(f"{what}: code={err.code} {err.message}")


def encode(path, compression, w=64, h=48):
    ctx = lib.heif_context_alloc()
    enc = ctypes.c_void_p()
    check(lib.heif_context_get_encoder_for_format(
        ctx, compression, ctypes.byref(enc)), "get_encoder")
    check(lib.heif_encoder_set_lossy_quality(enc, 60), "quality")
    img = ctypes.c_void_p()
    check(lib.heif_image_create(
        w, h, HEIF_COLORSPACE_YCBCR, HEIF_CHROMA_420, ctypes.byref(img)),
        "image_create")
    for ch, cw, chh in ((HEIF_CHANNEL_Y, w, h),
                        (HEIF_CHANNEL_CB, w // 2, h // 2),
                        (HEIF_CHANNEL_CR, w // 2, h // 2)):
        check(lib.heif_image_add_plane(img, ch, cw, chh, 8), "add_plane")
        stride = ctypes.c_int()
        p = lib.heif_image_get_plane(img, ch, ctypes.byref(stride))
        for y in range(chh):
            for x in range(cw):
                if ch == HEIF_CHANNEL_Y:
                    v = (x * 4 + y * 2 + (64 if (x // 8 + y // 8) % 2 else 0)) % 256
                else:
                    v = 128
                p[y * stride.value + x] = v
    check(lib.heif_context_encode_image(ctx, img, enc, None, None), "encode")
    check(lib.heif_context_write_to_file(ctx, path.encode()), "write")
    print(f"{path}: {os.path.getsize(path)} bytes")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    encode(os.path.join(out, "vector.avif"), HEIF_COMPRESSION_AV1)
    encode(os.path.join(out, "vector.heic"), HEIF_COMPRESSION_HEVC)
