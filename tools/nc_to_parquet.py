#!/usr/bin/env python3
"""netCDF -> parquet converter for the graft engine (SURVEY.md §2.1).

Maps the reference's input files onto the engine's long-form parquet
contract (graft/pipeline/Model.scala, FIXTURES.md §1-2):

 - Nortek AD2CP netCDF, group `Data/Average`  -> adcp.parquet
   (seaexplorertools/process_adcp.py:161-163)
 - group `Data/AverageBT`                     -> bt.parquet   (:1494)
 - glider parquet (`Skag_test.pqt` shape)     -> glider.parquet
   (:83-109 rename + derived columns)

Engines, in preference order:
 1. xarray + netCDF4 when importable — handles the real grouped
    (netCDF4/HDF5) `.ad2cp.nc` files. This is the path a reference user
    runs on their own machine.
 2. A built-in pure-python reader for NetCDF *classic* files (CDF-1 /
    CDF-2, per the public Unidata file-format spec) — no dependencies
    beyond numpy/pyarrow, used for flat single-group files and the
    self-test. Classic files have no groups, so pass the Average and BT
    tables as separate files (--adcp / --bt).

Usage:
  nc_to_parquet.py --adcp mission.ad2cp.nc --out outdir/
      [--glider Skag_test.pqt] [--avg-group Data/Average]
      [--bt-group Data/AverageBT]
  nc_to_parquet.py --adcp avg.nc --bt bt.nc --out outdir/   # flat classic
  nc_to_parquet.py --selftest outdir/    # synth fixture -> convert -> check
"""

import argparse
import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# Minimal NetCDF classic (CDF-1/CDF-2) reader + writer.
# Format: https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html
# ---------------------------------------------------------------------------

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_NC_TYPES = {1: ("b", 1), 2: ("c", 1), 3: (">i2", 2), 4: (">i4", 4),
             5: (">f4", 4), 6: (">f8", 8)}


def _pad4(n):
    return (4 - n % 4) % 4


class _Cdf:
    def __init__(self, buf):
        self.buf, self.pos = buf, 0

    def i4(self):
        v = struct.unpack_from(">i", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def i8(self):
        v = struct.unpack_from(">q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def name(self):
        n = self.i4()
        s = self.buf[self.pos:self.pos + n].decode("utf-8")
        self.pos += n + _pad4(n)
        return s

    def values(self, nc_type, n):
        dt, size = _NC_TYPES[nc_type]
        raw = self.buf[self.pos:self.pos + n * size]
        self.pos += n * size + _pad4(n * size)
        if nc_type == 2:
            return raw.decode("utf-8", "replace")
        return np.frombuffer(raw, dtype=dt, count=n)

    def att_list(self):
        tag, n = self.i4(), self.i4()
        atts = {}
        if tag == _NC_ATTRIBUTE:
            for _ in range(n):
                nm = self.name()
                atts[nm] = self.values(self.i4(), self.i4())
        return atts


def read_netcdf_classic(path):
    """Parse a NetCDF classic file -> (vars, var_attrs, global_attrs) where
    vars[name] is a numpy array with the variable's declared shape.
    Supports CDF-1/CDF-2, fixed and record variables, types byte/char/
    short/int/float/double.
    """
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"{path}: not a NetCDF classic file "
                         "(netCDF4/HDF5 needs the xarray engine)")
    v64 = buf[3] == 2
    c = _Cdf(buf)
    c.pos = 4
    numrecs = c.i4()
    dims = []
    tag, n = c.i4(), c.i4()
    if tag == _NC_DIMENSION:
        for _ in range(n):
            dims.append((c.name(), c.i4()))
    gatts = c.att_list()
    out, vatts, recvars = {}, {}, []
    tag, n = c.i4(), c.i4()
    if tag == _NC_VARIABLE:
        for _ in range(n):
            nm = c.name()
            dimids = [c.i4() for _ in range(c.i4())]
            atts = c.att_list()
            nc_type, _vsize = c.i4(), c.i4()
            begin = c.i8() if v64 else c.i4()
            shape = [dims[d][1] for d in dimids]
            is_rec = bool(shape) and shape[0] == 0
            dt, size = _NC_TYPES[nc_type]
            vatts[nm] = atts
            if is_rec:
                per_rec = int(np.prod(shape[1:], dtype=np.int64))
                vsize = per_rec * size + _pad4(per_rec * size)
                recvars.append((nm, dt, begin, per_rec, vsize, shape[1:]))
            else:
                cnt = int(np.prod(shape, dtype=np.int64))
                arr = np.frombuffer(buf, dtype=dt, count=cnt, offset=begin)
                out[nm] = arr.reshape(shape).astype(dt.lstrip(">"))
    recsize = sum(v[4] for v in recvars)
    if len(recvars) == 1:  # spec: single record var is not padded
        nm, dt, begin, per_rec, _, tail = recvars[0]
        arr = np.frombuffer(buf, dtype=dt, count=numrecs * per_rec,
                            offset=begin)
        out[nm] = arr.reshape([numrecs] + tail).astype(dt.lstrip(">"))
    else:
        for nm, dt, begin, per_rec, _, tail in recvars:
            recs = [np.frombuffer(buf, dtype=dt, count=per_rec,
                                  offset=begin + r * recsize)
                    for r in range(numrecs)]
            arr = (np.stack(recs) if recs
                   else np.empty((0, *tail), dtype=dt.lstrip(">")))
            out[nm] = arr.reshape([numrecs] + tail).astype(dt.lstrip(">"))
    return out, vatts, gatts


def write_netcdf_classic(path, dims, variables, var_attrs=None,
                         global_attrs=None):
    """Write a flat CDF-1 file: dims = [(name, size)], variables =
    {name: (dim_names, float64 array)}. Attributes are char-typed only
    (enough for `units`). All variables fixed-size (no record dim).
    """
    var_attrs = var_attrs or {}
    global_attrs = global_attrs or {}
    dimidx = {nm: i for i, (nm, _) in enumerate(dims)}

    def bname(s):
        b = s.encode("utf-8")
        return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))

    def batts(atts):
        if not atts:
            return struct.pack(">ii", 0, 0)
        out = struct.pack(">ii", _NC_ATTRIBUTE, len(atts))
        for k, v in atts.items():
            b = v.encode("utf-8")
            out += (bname(k) + struct.pack(">ii", 2, len(b)) + b
                    + b"\x00" * _pad4(len(b)))
        return out

    header = b"CDF\x01" + struct.pack(">i", 0)
    header += struct.pack(">ii", _NC_DIMENSION, len(dims))
    for nm, size in dims:
        header += bname(nm) + struct.pack(">i", size)
    header += batts(global_attrs)

    bodies = []
    for nm, (dnames, arr) in variables.items():
        arr = np.ascontiguousarray(arr, dtype=">f8")
        vsize = arr.size * 8
        bodies.append((nm, dnames, arr, vsize + _pad4(vsize)))
    fixed = struct.pack(">ii", _NC_VARIABLE, len(bodies))
    # begin offsets need the header length: assemble once with zeros, then fix
    def var_entry(nm, dnames, vsize, begin):
        e = bname(nm) + struct.pack(">i", len(dnames))
        for d in dnames:
            e += struct.pack(">i", dimidx[d])
        e += batts(var_attrs.get(nm, {}))
        e += struct.pack(">iii", 6, vsize, begin)
        return e
    probe = fixed + b"".join(
        var_entry(nm, dn, vs, 0) for nm, dn, _, vs in bodies)
    begin = len(header) + len(probe)
    entries, offsets = [], []
    for nm, dn, arr, vs in bodies:
        offsets.append(begin)
        entries.append(var_entry(nm, dn, vs, begin))
        begin += vs
    with open(path, "wb") as f:
        f.write(header + fixed + b"".join(entries))
        for (_, _, arr, vs) in bodies:
            raw = arr.tobytes()
            f.write(raw + b"\x00" * (vs - len(raw)))


# ---------------------------------------------------------------------------
# Group loading: xarray (grouped netCDF4) or the classic reader (flat).
# ---------------------------------------------------------------------------

def load_group(path, group):
    try:
        import xarray as xr
        ds = xr.open_dataset(path, group=group)
        arrs = {nm: ds[nm].values for nm in list(ds.variables)}
        atts = {nm: {k: v for k, v in ds[nm].attrs.items()}
                for nm in list(ds.variables)}
        return arrs, atts
    except ImportError:
        arrs, vatts, _ = read_netcdf_classic(path)
        return arrs, vatts


def time_to_ns(vals, attrs):
    """Engine time contract: epoch nanoseconds as int64. xarray decodes
    netCDF4 time to datetime64[ns]; classic fixtures carry a `units`
    attribute (seconds/milliseconds/microseconds since epoch)."""
    if np.issubdtype(np.asarray(vals).dtype, np.datetime64):
        return np.asarray(vals).astype("datetime64[ns]").astype(np.int64)
    units = ""
    if attrs:
        u = attrs.get("units", "")
        units = u if isinstance(u, str) else ""
    scale = (1_000_000_000 if units.startswith("seconds") else
             1_000_000 if units.startswith("milliseconds") else
             1_000 if units.startswith("microseconds") else 1)
    return np.rint(np.asarray(vals, dtype=np.float64) * scale).astype(np.int64)


# ---------------------------------------------------------------------------
# Table mapping (Model.Schema / Fixture column names).
# ---------------------------------------------------------------------------

def _list_col(arr2d):
    arr2d = np.asarray(arr2d, dtype=np.float64)
    n, k = arr2d.shape
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * k)
    return pa.ListArray.from_arrays(offsets, pa.array(arr2d.reshape(-1)))


def adcp_table(arrs, atts):
    t = time_to_ns(arrs["time"], atts.get("time", {}))
    n = len(t)
    ranges = np.asarray(arrs["Velocity Range"], dtype=np.float64)
    cols = {"time_ns": pa.array(t)}
    for src, dst in [("Pressure", "pressure"), ("Pitch", "pitch"),
                     ("Roll", "roll"), ("Heading", "heading"),
                     ("MagnetometerX", "mag_x"), ("MagnetometerY", "mag_y"),
                     ("MagnetometerZ", "mag_z"),
                     ("SpeedOfSound", "speed_of_sound")]:
        cols[dst] = pa.array(np.asarray(arrs[src], dtype=np.float64))
    cols["ranges"] = _list_col(np.tile(ranges, (n, 1)))
    for b in "1234":
        cols[f"vel{b}"] = _list_col(arrs[f"VelocityBeam{b}"])
        cols[f"corr{b}"] = _list_col(arrs[f"CorrelationBeam{b}"])
        cols[f"amp{b}"] = _list_col(arrs[f"AmplitudeBeam{b}"])
    return pa.table(cols)


def bt_table(arrs, atts):
    t = time_to_ns(arrs["time"], atts.get("time", {}))
    cols = {"time_ns": pa.array(t)}
    for src, dst in [("Pressure", "pressure"), ("Heading", "heading"),
                     ("Pitch", "pitch"), ("Roll", "roll"),
                     ("VelocityBeam1", "vel_b1"), ("VelocityBeam2", "vel_b2"),
                     ("VelocityBeam4", "vel_b4"),
                     ("FOMBeam1", "fom_b1"), ("FOMBeam2", "fom_b2"),
                     ("FOMBeam4", "fom_b4"),
                     ("SpeedOfSound", "speed_of_sound_bt")]:
        cols[dst] = pa.array(np.asarray(arrs[src], dtype=np.float64))
    return pa.table(cols)


# Glider parquet renames (process_adcp.py:83-104 + test graft 57-63).
_GLIDER_RENAMES = {
    "Timestamp": "time", "profileNum": "profile_number",
    "Declination": "declination", "LEGATO_PRESSURE": "pressure",
    "DeadReckoning": "dead_reckoning", "NAV_RESOURCE": "nav_resource",
    "diveNum": "dive_number",
}


def glider_table(pqt_path):
    import pandas as pd
    df = pd.read_parquet(pqt_path)
    df = df.rename(columns={k: v for k, v in _GLIDER_RENAMES.items()
                            if k in df.columns})
    ts = pd.to_datetime(df["time"])
    df["time_ns"] = ts.astype("int64")
    df = df.drop(columns=["time"])
    # date_float: ns since epoch as double (process_adcp.py:105)
    if "date_float" not in df.columns:
        df["date_float"] = df["time_ns"].astype("float64")
    keep = ["time_ns", "temperature", "salinity", "latitude", "longitude",
            "profile_number", "dive_number", "pressure", "speed_vert",
            "speed_horz", "dead_reckoning", "nav_resource", "declination",
            "date_float"]
    cols = [c for c in keep if c in df.columns] + \
           [c for c in df.columns if c not in keep]
    return pa.Table.from_pandas(df[cols], preserve_index=False)


# ---------------------------------------------------------------------------
# Self-test: synthetic flat fixture -> convert -> check.
# ---------------------------------------------------------------------------

def selftest(outdir):
    os.makedirs(outdir, exist_ok=True)
    n, nbins = 1200, 15
    t0 = 1.7e9  # epoch seconds; matches graft.pipeline.Fixture t0ns
    i = np.arange(n, dtype=np.float64)
    # yo: 600 s per profile, 0..40 dbar triangle; pitch follows dive dir
    phase = (i % 600.0) / 600.0
    press = np.where(phase < 0.5, phase * 80.0, (1.0 - phase) * 80.0)
    pitch = np.where(phase < 0.5, -17.4, 17.4)
    ranges = 2.0 + 1.0 * (np.arange(nbins) + 0.5)
    dims = [("time", n), ("vrange", nbins)]
    twod = ("time", "vrange")

    def beam(v):
        return np.full((n, nbins), v) + 0.001 * i[:, None]

    avg = {
        "time": (("time",), t0 + i),
        "Velocity Range": (("vrange",), ranges),
        "Pressure": (("time",), press),
        "Pitch": (("time",), pitch),
        "Roll": (("time",), np.full(n, 1.5)),
        "Heading": (("time",), 45.0 + 10.0 * np.sin(i * 0.001)),
        "MagnetometerX": (("time",), np.full(n, 300.0)),
        "MagnetometerY": (("time",), np.full(n, 200.0)),
        "MagnetometerZ": (("time",), np.full(n, 310.0)),
        "SpeedOfSound": (("time",), np.full(n, 1500.0)),
    }
    for b in "1234":
        avg[f"VelocityBeam{b}"] = (twod, beam(0.05 * int(b)))
        avg[f"CorrelationBeam{b}"] = (twod, np.full((n, nbins), 90.0))
        avg[f"AmplitudeBeam{b}"] = (twod, np.full((n, nbins), 50.0))
    avg_path = os.path.join(outdir, "avg.nc")
    write_netcdf_classic(avg_path, dims, avg,
                         var_attrs={"time": {"units": "seconds since 1970-01-01"}})

    m = 200
    j = np.arange(m, dtype=np.float64)
    bt = {
        "time": (("time",), t0 + j * 6.0),
        "Pressure": (("time",), np.full(m, 35.0)),
        "Heading": (("time",), np.full(m, 45.0)),
        "Pitch": (("time",), np.full(m, -17.4)),
        "Roll": (("time",), np.full(m, 1.5)),
        "VelocityBeam1": (("time",), np.full(m, 0.1)),
        "VelocityBeam2": (("time",), np.full(m, 0.12)),
        "VelocityBeam4": (("time",), np.full(m, 0.08)),
        "FOMBeam1": (("time",), np.full(m, 5.0)),
        "FOMBeam2": (("time",), np.full(m, 5.0)),
        "FOMBeam4": (("time",), np.full(m, 5.0)),
        "SpeedOfSound": (("time",), np.full(m, 1500.0)),
    }
    bt_path = os.path.join(outdir, "bt.nc")
    write_netcdf_classic(bt_path, [("time", m)], bt,
                         var_attrs={"time": {"units": "seconds since 1970-01-01"}})

    # convert through the same path real files take
    arrs, vatts = load_group(avg_path, None)
    tbl = adcp_table(arrs, vatts)
    pq.write_table(tbl, os.path.join(outdir, "adcp.parquet"))
    arrs_bt, vatts_bt = load_group(bt_path, None)
    tbl_bt = bt_table(arrs_bt, vatts_bt)
    pq.write_table(tbl_bt, os.path.join(outdir, "bt.parquet"))

    # round-trip checks
    back = pq.read_table(os.path.join(outdir, "adcp.parquet"))
    assert back.num_rows == n, back.num_rows
    assert back["time_ns"][0].as_py() == int(t0 * 1e9)
    v3 = np.array(back["vel3"][7].as_py())
    assert np.allclose(v3, avg["VelocityBeam3"][1][7]), v3
    assert np.allclose(np.array(back["ranges"][0].as_py()), ranges)
    assert pq.read_table(os.path.join(outdir, "bt.parquet")).num_rows == m
    print(f"selftest OK: {outdir}/adcp.parquet ({n} pings x {nbins} bins), "
          f"{outdir}/bt.parquet ({m} rows)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--adcp", help=".ad2cp.nc (grouped) or flat Average .nc")
    ap.add_argument("--bt", help="flat AverageBT .nc (classic engine only)")
    ap.add_argument("--glider", help="glider parquet (Skag_test.pqt shape)")
    ap.add_argument("--out", help="output directory")
    ap.add_argument("--avg-group", default="Data/Average")
    ap.add_argument("--bt-group", default="Data/AverageBT")
    ap.add_argument("--selftest", metavar="DIR",
                    help="generate a synthetic fixture, convert, verify")
    args = ap.parse_args()

    if args.selftest:
        selftest(args.selftest)
        return
    if not args.out or not (args.adcp or args.glider):
        ap.error("need --out plus --adcp and/or --glider (or --selftest)")
    os.makedirs(args.out, exist_ok=True)
    if args.adcp:
        flat = args.bt is not None or open(args.adcp, "rb").read(3) == b"CDF"
        arrs, atts = load_group(args.adcp, None if flat else args.avg_group)
        pq.write_table(adcp_table(arrs, atts),
                       os.path.join(args.out, "adcp.parquet"))
        print(f"wrote {args.out}/adcp.parquet")
        bt_src = args.bt if flat else args.adcp
        if bt_src:
            try:
                arrs_bt, atts_bt = load_group(
                    bt_src, None if flat else args.bt_group)
                pq.write_table(bt_table(arrs_bt, atts_bt),
                               os.path.join(args.out, "bt.parquet"))
                print(f"wrote {args.out}/bt.parquet")
            except (KeyError, OSError, ValueError) as e:
                print(f"no bottom-track table converted: {e}", file=sys.stderr)
    if args.glider:
        pq.write_table(glider_table(args.glider),
                       os.path.join(args.out, "glider.parquet"))
        print(f"wrote {args.out}/glider.parquet")


if __name__ == "__main__":
    main()
