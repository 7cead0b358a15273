#!/usr/bin/env python3
"""Dense-grid parquet -> netCDF-classic exporter (the make_dataset sink).

The reference's final step hands the user an xarray Dataset shaped
(depth_bin, profile_num) that they persist with `ds.to_netcdf(path)`
(seaexplorertools/process_adcp.py:2029-2043). The engine's
`GridOutput.makeDataset(dense = true)` emits that exact cell domain as a
tall parquet relation (xbin, ybin, variables..., profile_datetime_ns);
this tool pivots it into 2-D variables and writes the same netCDF shape,
so a reference user switching engines keeps their .nc downstream tooling.

Driver-side utility (numpy/pyarrow), same footing as nc_to_parquet.py.
Multi-mission (fleet) outputs write ONE FILE PER MISSION -- the reference
cardinality -- named `<out-stem>__<mission>.nc`.

Usage:
  dataset_to_nc.py --in dense_parquet_dir_or_file --out out.nc
      [--mission-col mission]
  dataset_to_nc.py --selftest DIR     # synth tall grid -> export -> re-read
"""

import argparse
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from nc_to_parquet import read_netcdf_classic, write_netcdf_classic


def _to_float(col):
    """Arrow column -> float64 numpy with nulls as NaN (any numeric type)."""
    return col.to_pandas().astype("float64").to_numpy()


def export_table(table, out_path):
    """Pivot one mission's tall dense grid into (depth_bin, profile_num)
    variables and write a classic netCDF file. Expects the full dense cell
    domain (every (xbin, ybin) pair present), which makeDataset(dense=true)
    guarantees; xbin/ybin are 0-based and contiguous.
    """
    xb = table.column("xbin").to_pandas().to_numpy().astype(np.int64)
    yb = table.column("ybin").to_pandas().to_numpy().astype(np.int64)
    if len(xb) == 0:
        raise SystemExit(f"empty input for {out_path}")
    nx, ny = int(xb.max()) + 1, int(yb.max()) + 1
    if len(xb) != nx * ny:
        raise SystemExit(
            f"{out_path}: {len(xb)} rows != dense {ny}x{nx} domain -- "
            "export from makeDataset(dense = true), not the sparse grid")
    dims = [("depth_bin", ny), ("profile_num", nx)]
    variables = {
        # the coordinate arrays the reference's make_dataset attaches
        "depth_bin": (("depth_bin",), np.arange(ny, dtype=np.float64)),
        "profile_num": (("profile_num",), np.arange(nx, dtype=np.float64)),
    }
    var_attrs = {}
    for nm in table.column_names:
        if nm in ("xbin", "ybin"):
            continue
        try:
            vals = _to_float(table.column(nm))
        except (ValueError, TypeError):
            continue  # non-numeric (e.g. string mission key remnants)
        if nm == "profile_datetime_ns":
            arr = np.full(nx, np.nan)
            arr[xb] = vals  # constant within a profile column by construction
            variables["profile_datetime"] = (("profile_num",), arr)
            var_attrs["profile_datetime"] = {
                "units": "nanoseconds since 1970-01-01"}
        else:
            g = np.full((ny, nx), np.nan)
            g[yb, xb] = vals
            variables[nm] = (("depth_bin", "profile_num"), g)
    write_netcdf_classic(out_path, dims, variables, var_attrs=var_attrs,
                         global_attrs={"title": "graft make_dataset export"})
    return ny, nx


def export(in_path, out_path, mission_col=None):
    table = pq.read_table(in_path)
    if mission_col is None:
        ny, nx = export_table(table, out_path)
        print(f"wrote {out_path}: {ny} depth_bins x {nx} profiles")
        return
    missions = sorted(set(table.column(mission_col).to_pylist()),
                      key=lambda v: (v is None, str(v)))
    stem, ext = os.path.splitext(out_path)
    import pyarrow.compute as pc
    for m in missions:
        mask = (pc.is_null(table.column(mission_col)) if m is None
                else pc.equal(table.column(mission_col), m))
        sub = table.filter(mask).drop_columns([mission_col])
        path = f"{stem}__{m if m is not None else 'null'}{ext}"
        ny, nx = export_table(sub, path)
        print(f"wrote {path}: {ny} depth_bins x {nx} profiles")


def selftest(outdir):
    """Synth tall dense grid -> export -> classic re-read -> exact match."""
    import pyarrow as pa
    os.makedirs(outdir, exist_ok=True)
    ny, nx = 5, 3
    yb, xb = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    rng = np.random.default_rng(7)
    vel = rng.normal(size=(ny, nx))
    vel[0, 0] = np.nan  # hole must survive as NaN
    dt = np.array([1.7e18, 1.7e18 + 1e9, np.nan])
    table = pa.table({
        "xbin": xb.ravel().astype(np.int64),
        "ybin": yb.ravel().astype(np.int64),
        "ADCP_E": pa.array(np.where(np.isnan(vel.ravel()), None, vel.ravel())),
        "profile_datetime_ns": pa.array(
            [None if np.isnan(dt[x]) else dt[x] for x in xb.ravel()]),
    })
    pq_path = os.path.join(outdir, "dense.parquet")
    nc_path = os.path.join(outdir, "dense.nc")
    pq.write_table(table, pq_path)
    export(pq_path, nc_path)
    arrs, _, _ = read_netcdf_classic(nc_path)
    back = np.asarray(arrs["ADCP_E"], dtype=np.float64)
    assert back.shape == (ny, nx), back.shape
    assert np.allclose(back, vel, equal_nan=True), "ADCP_E round-trip"
    pdt = np.asarray(arrs["profile_datetime"], dtype=np.float64)
    assert np.allclose(pdt, dt, equal_nan=True), "profile_datetime round-trip"
    print(f"selftest OK: {nc_path} round-trips {ny}x{nx} incl. NaN holes")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", metavar="PARQUET")
    ap.add_argument("--out", metavar="NC")
    ap.add_argument("--mission-col", default=None)
    ap.add_argument("--selftest", metavar="DIR")
    args = ap.parse_args()
    if args.selftest:
        selftest(args.selftest)
        return
    if not (args.inp and args.out):
        ap.error("need --in and --out (or --selftest)")
    export(args.inp, args.out, args.mission_col)


if __name__ == "__main__":
    main()
