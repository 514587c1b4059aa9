"""Pure-Python NetCDF3 classic (CDF-1) encoding — real ``.nc`` files
without xarray/netCDF4/scipy.

Same motivation as ``sinks/tiff.py``: the interop sink's fallback should
emit the REAL container, not a stub. NetCDF3 classic is a simple
self-describing binary format (magic, dimension list, attribute list,
variable list, then fixed-size data blocks); files written here open in
xarray/netCDF4/scipy/ncdump anywhere. The one thing classic format
cannot carry is zlib compression (an HDF5/netCDF4 feature) — that stays
on the xarray branch, which also writes the reference's complevel-5
encoding (``core/pipeline.py:176``).

Scope: fixed (non-record) dimensions, float32/float64 variables, string
global attributes — exactly the cube-export shape. A matching reader
(:func:`read_netcdf3`) decodes what the writer produces (and any
same-scope classic file), so round-trips are testable in this container
and the distributed NetCDF scan can consume fallback-written files.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C
_NC_CHAR, _NC_INT, _NC_FLOAT, _NC_DOUBLE = 2, 4, 5, 6
_TYPE_OF_DTYPE = {"float32": _NC_FLOAT, "float64": _NC_DOUBLE, "int32": _NC_INT}
_DTYPE_OF_TYPE = {_NC_FLOAT: ">f4", _NC_DOUBLE: ">f8", _NC_INT: ">i4",
                  _NC_CHAR: "S1"}
_SIZE_OF_TYPE = {_NC_CHAR: 1, _NC_INT: 4, _NC_FLOAT: 4, _NC_DOUBLE: 8}


def _pad4(b: bytes) -> bytes:
    return b + b"\0" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _attrs_block(attrs: dict[str, str]) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)  # ABSENT
    out = struct.pack(">II", _NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        raw = str(v).encode("utf-8")
        out += _name(k) + struct.pack(">II", _NC_CHAR, len(raw)) + _pad4(raw)
    return out


def encode_netcdf3(variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
                   global_attrs: dict[str, str] | None = None) -> bytes:
    """Encode variables as a CDF-1 classic file.

    ``variables``: name → (dim-name tuple, array); dimension sizes are
    inferred from the arrays and must agree across variables. Data is
    written big-endian per the spec.
    """
    # collect dimensions in first-appearance order
    dims: dict[str, int] = {}
    for vname, (dnames, arr) in variables.items():
        arr = np.asarray(arr)
        if len(dnames) != arr.ndim:
            raise ValueError(f"{vname}: {len(dnames)} dims for {arr.ndim}-d array")
        for dn, size in zip(dnames, arr.shape):
            if dims.setdefault(dn, size) != size:
                raise ValueError(
                    f"dimension {dn!r} size conflict: {dims[dn]} vs {size}"
                )
    dim_ids = {dn: i for i, dn in enumerate(dims)}

    header = b"CDF\x01" + struct.pack(">I", 0)  # numrecs = 0
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for dn, size in dims.items():
        header += _name(dn) + struct.pack(">I", size)
    header += _attrs_block(global_attrs or {})

    # variable metadata — data offsets depend on header size, so build
    # entries with a placeholder then patch
    var_meta = []
    for vname, (dnames, arr) in variables.items():
        arr = np.asarray(arr)
        nc_type = _TYPE_OF_DTYPE.get(str(arr.dtype))
        if nc_type is None:
            raise ValueError(f"{vname}: unsupported dtype {arr.dtype}")
        vsize = arr.size * _SIZE_OF_TYPE[nc_type]
        vsize += -vsize % 4
        entry = _name(vname)
        entry += struct.pack(">I", len(dnames))
        for dn in dnames:
            entry += struct.pack(">I", dim_ids[dn])
        entry += struct.pack(">II", 0, 0)  # no variable attrs (ABSENT)
        entry += struct.pack(">II", nc_type, vsize)
        var_meta.append((entry, arr, nc_type, vsize))

    var_list_size = 8 + sum(len(e) + 4 for e, *_ in var_meta)  # +4: begin
    begin = len(header) + var_list_size
    body = struct.pack(">II", _NC_VARIABLE, len(var_meta))
    data = b""
    for entry, arr, nc_type, vsize in var_meta:
        body += entry + struct.pack(">I", begin)
        blob = arr.astype(_DTYPE_OF_TYPE[nc_type]).tobytes()
        data += _pad4(blob)
        begin += vsize
    return header + body + data


def read_netcdf3(data: bytes) -> dict:
    """Decode a CDF-1/CDF-2 classic file (fixed dims, no record vars):
    returns {"dims": {...}, "attrs": {...}, "vars": {name: array}}."""
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a NetCDF classic file")
    offsize = 4 if data[3] == 1 else 8
    pos = 8  # skip magic + numrecs

    def u32():
        nonlocal pos
        (v,) = struct.unpack_from(">I", data, pos)
        pos += 4
        return v

    def name():
        nonlocal pos
        n = u32()
        raw = data[pos: pos + n]
        pos += n + (-n % 4)
        return raw.decode("utf-8")

    def attrs():
        nonlocal pos
        tag, n = u32(), u32()
        out = {}
        for _ in range(n):
            k = name()
            typ, cnt = u32(), u32()
            size = cnt * _SIZE_OF_TYPE[typ]
            vals_raw = data[pos: pos + size]
            pos += size + (-size % 4)
            if typ == _NC_CHAR:
                out[k] = vals_raw.decode("utf-8")
            else:
                out[k] = list(
                    np.frombuffer(vals_raw, dtype=_DTYPE_OF_TYPE[typ])
                )
        return out

    # dim list
    tag, ndims = u32(), u32()
    dims = []
    for _ in range(ndims):
        dn = name()
        dims.append((dn, u32()))
    gattrs = attrs()
    tag, nvars = u32(), u32()
    out_vars = {}
    for _ in range(nvars):
        vn = name()
        nd = u32()
        shape = tuple(dims[u32()][1] for _ in range(nd))
        _ = attrs()  # variable attrs (ignored)
        typ, vsize = u32(), u32()
        if offsize == 4:
            begin = u32()
        else:
            (begin,) = struct.unpack_from(">Q", data, pos)
            pos += 8
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(
            data, dtype=_DTYPE_OF_TYPE[typ], count=count, offset=begin
        ).reshape(shape)
        out_vars[vn] = arr
    return {"dims": dict(dims), "attrs": gattrs, "vars": out_vars}
