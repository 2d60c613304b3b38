"""Sky-catalog interface — imsim/skycat.py parity (SkyCatalogInterface).

The reference queries the LSSTDESC skyCatalogs package: parquet files of
objects with per-component GSObjects + SEDs, selected by a polygonal
region around the CCD (imsim/skycat.py:88-107), flux = SED x bandpass x
exptime x pupil area (:148-203).  That package isn't a dependency here;
this module reads the same parquet data directly with pandas, with a
configurable column mapping so DC2-era and newer schemas both load, and
produces the framework's ObjectTable (galaxies become one Sersic
component per catalog component row; knots supported).
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..utils.coords import DEG
from .instcat import KNOTS, ObjectTable, POINT, SERSIC

# default column mapping (DC2 / skyCatalogs-style names)
DEFAULT_COLUMNS = dict(
    id="id", ra="ra", dec="dec",
    magnorm="magnorm",
    sed="sed_filepath",
    redshift="redshift",
    obj_kind="object_type",        # 'star' | 'galaxy' | ...
    hlr="size_true",               # arcsec (half-light radius)
    sersic="sersic_index",
    q="axis_ratio",
    beta="position_angle",         # degrees
    g1="shear_1", g2="shear_2", kappa="convergence",
    mw_av="MW_av", mw_rv="MW_rv",
)


@dataclass
class SkyCatalogInterface:
    """Loads one or more parquet files and serves culled ObjectTables.

    Parameters mirror the reference's loader options (skycat.py:302-306):
    obj_types filter, edge_pix margin, mjd/exptime for flux, and the
    'dc2 dilation' / flux-cache options are handled by the scene builder.
    """

    file_name: str | list
    columns: dict | None = None
    obj_types: tuple | None = None
    # DC2 convention: dilate galaxy sizes by sqrt(a/b) so the catalog
    # half-light radius means the SEMI-MAJOR axis (imsim/skycat.py
    # apply_dc2_dilation; galaxies only)
    apply_dc2_dilation: bool = False

    # skyCatalogs root dir override (imsim/skycat.py skycatalog_root)
    skycatalog_root: str | None = None

    def __post_init__(self):
        import pandas as pd

        files = ([self.file_name] if isinstance(self.file_name, str)
                 else list(self.file_name))
        self.native = None
        if len(files) == 1 and files[0].endswith((".yaml", ".yml")):
            # the native skyCatalogs format: yaml catalog config +
            # healpix-keyed parquet files (imsim/skycat.py:101-107)
            from .skycat_native import NativeSkyCatalog

            self.native = NativeSkyCatalog(
                files[0], skycatalog_root=self.skycatalog_root)
            self.df = None
            self.cols = dict(DEFAULT_COLUMNS)
            return
        frames = []
        for f in files:
            if not os.path.exists(f):
                raise OSError(f"sky catalog not found: {f}")
            if f.endswith((".parquet", ".pq")):
                frames.append(pd.read_parquet(f))
            else:
                frames.append(pd.read_csv(f))
        self.df = pd.concat(frames, ignore_index=True)
        self.cols = dict(DEFAULT_COLUMNS)
        if self.columns:
            self.cols.update(self.columns)

    def _get(self, name, default=None, df=None, cols=None):
        df = self.df if df is None else df
        cols = self.cols if cols is None else cols
        col = cols.get(name)
        if col and col in df.columns:
            return df[col].to_numpy()
        return default

    def _expand_components(self):
        """Multi-component galaxy assembly (imsim/skycat.py:147-203:
        get_gsobject_components returns {bulge, disk, knots} and the
        builder Adds them).  When the frame carries DC2-style
        per-component columns, each galaxy row becomes one ObjectTable
        row per component:

          bulge: Sersic(sersic_bulge), hlr = size_bulge_true,
                 q from size_minor_bulge_true / size_bulge_true
          disk:  Sersic(sersic_disk), same pattern, flux reduced by the
                 knots carve-out (DC2: knots flux is part of the disk)
          knots: n_knots RandomKnots with the disk's morphology

        Flux split: bulge_frac of the total to the bulge; the rest to
        disk*(1 - knots_flux_ratio) and knots.  magnorm is adjusted by
        -2.5 log10(frac) per component row.  A component whose nominal
        fraction is positive but which cannot be built (size<=0, or
        n_knots<1 for knots) has its share folded back into the row's
        buildable components (renormalized), matching the reference's
        behavior of only carving out flux for components it actually
        builds — no flux is silently dropped.

        Pure: returns ``(df, cols)`` without mutating ``self`` (the
        expanded frame carries ``*_expanded`` columns that the returned
        mapping routes to), so repeated ``to_object_table`` calls never
        re-expand already-expanded rows.
        """
        import pandas as pd

        df = self.df
        cols = dict(self.cols)
        if "size_bulge_true" not in df.columns and \
                "size_disk_true" not in df.columns:
            return df, cols
        kind = np.array([str(k).lower() for k in
                         self._get("obj_kind",
                                   np.array(["star"] * len(df), object))],
                        object)
        gal = kind == "galaxy"
        if not gal.any():
            return df, cols
        base = df[~gal]
        g = df[gal]

        def col(name, default):
            return (g[name].to_numpy(float) if name in g.columns
                    else np.full(len(g), default))

        bulge_frac = np.clip(col("bulge_frac", 0.0), 0.0, 1.0)
        knots_ratio = np.clip(col("knots_flux_ratio", 0.0), 0.0, 1.0)
        n_knots = col("n_knots", 0.0)
        size_bulge = col("size_bulge_true", 0.0)
        size_disk = col("size_disk_true", 0.0)
        # nominal split → zero out unbuildable components → renormalize
        # so the dropped share flows to the survivors.
        f_bulge = bulge_frac * (size_bulge > 0)
        f_disk = (1 - bulge_frac) * (1 - knots_ratio) * (size_disk > 0)
        f_knots = ((1 - bulge_frac) * knots_ratio
                   * ((size_disk > 0) & (n_knots >= 1)))
        total = f_bulge + f_disk + f_knots
        scale = np.where(total > 0, 1.0 / np.maximum(total, 1e-12), 0.0)
        rows = []
        specs = [
            ("bulge", f_bulge * scale, "size_bulge_true",
             "size_minor_bulge_true", col("sersic_bulge", 4.0), None),
            ("disk", f_disk * scale, "size_disk_true",
             "size_minor_disk_true", col("sersic_disk", 1.0), None),
            ("knots", f_knots * scale, "size_disk_true",
             "size_minor_disk_true", None, n_knots),
        ]
        mag = (g[cols["magnorm"]].to_numpy(float)
               if cols["magnorm"] in g.columns
               else np.full(len(g), 25.0))
        for cname, frac, scol, smcol, sersic, nk in specs:
            size = col(scol, 0.0)
            keep = (frac > 1e-6) & (size > 0)
            if nk is not None:
                keep &= nk >= 1
            if not keep.any():
                continue
            sub = g[keep].copy()
            size_k = size[keep]
            minor = col(smcol, 0.0)[keep]
            sub["object_type_expanded"] = "knots" if cname == "knots" \
                else "galaxy"
            sub["size_true_expanded"] = np.sqrt(
                size_k * np.where(minor > 0, minor, size_k))
            sub["axis_ratio_expanded"] = np.where(
                minor > 0, minor / size_k, 1.0)
            sub["sersic_expanded"] = (nk[keep] if nk is not None
                                      else sersic[keep])
            sub["magnorm_expanded"] = mag[keep] - 2.5 * np.log10(
                np.maximum(frac[keep], 1e-12))
            rows.append(sub)
        if not rows:
            return df, cols
        out = pd.concat([base] + rows, ignore_index=True)
        # route the mapped columns at the expanded names
        for key, newcol in (("obj_kind", "object_type_expanded"),
                            ("hlr", "size_true_expanded"),
                            ("q", "axis_ratio_expanded"),
                            ("sersic", "sersic_expanded"),
                            ("magnorm", "magnorm_expanded")):
            old = cols.get(key)
            fallback = out[old] if old in out.columns else np.nan
            out[newcol] = out[newcol].where(out[newcol].notna(),
                                            fallback) \
                if newcol in out.columns else fallback
            cols[key] = newcol
        return out, cols

    def _native_table(self, wcs, xsize, ysize, edge_pix, logger):
        """Native-format path: healpix region query around the CCD
        corners (imsim/skycat.py:88-107) + component expansion, then
        the same pixel-box cull as the mapped path."""
        if wcs is not None:
            corners = [(-edge_pix, -edge_pix), (xsize + edge_pix, -edge_pix),
                       (xsize + edge_pix, ysize + edge_pix),
                       (-edge_pix, ysize + edge_pix)]
            xs = np.array([c[0] for c in corners], float)
            ys = np.array([c[1] for c in corners], float)
            ra, dec = wcs.xy_to_radec(xs, ys)
            vertices = np.stack([np.asarray(ra) / DEG,
                                 np.asarray(dec) / DEG], -1)
            tab = self.native.get_objects_by_region(
                vertices, obj_types=self.obj_types, logger=logger)
        else:
            # no WCS: accept every file (tests / full-catalog scans)
            tab = self.native.get_objects_by_region(
                None, obj_types=self.obj_types, logger=logger)
        if self.apply_dc2_dilation and len(tab):
            from .instcat import POINT as _PT

            gal = tab.obj_type != _PT
            qc = np.clip(np.asarray(tab.p2, float), 0.05, 1.0)
            tab.p0 = np.where(gal, tab.p0 / np.sqrt(qc), tab.p0)
        if wcs is not None and len(tab):
            x, y = wcs.radec_to_xy(tab.ra, tab.dec)
            tab.x, tab.y = np.asarray(x, float), np.asarray(y, float)
            keep = ((tab.x >= -edge_pix) & (tab.x <= xsize + edge_pix)
                    & (tab.y >= -edge_pix) & (tab.y <= ysize + edge_pix))
            tab = tab.select(keep)
        if logger:
            logger.info("skycat (native): %d objects kept", len(tab))
        return tab

    def to_object_table(self, wcs=None, xsize=4096, ysize=4096,
                        edge_pix=100, logger=None) -> ObjectTable:
        """Polygon-region cull (the pixel-box equivalent of
        skycat.py:88-107) + schema conversion."""
        if self.native is not None:
            return self._native_table(wcs, xsize, ysize, edge_pix, logger)
        df, cols = self._expand_components()
        n = len(df)

        def get(name, default=None):
            return self._get(name, default, df=df, cols=cols)

        ra = get("ra") * DEG
        dec = get("dec") * DEG
        kind = get("obj_kind", np.array(["star"] * n, object))
        kind = np.array([str(k).lower() for k in kind], object)
        if self.obj_types:
            keep_kind = np.isin(kind, [k.lower() for k in self.obj_types])
        else:
            keep_kind = np.ones(n, bool)

        obj_type = np.where(kind == "galaxy", SERSIC,
                            np.where(kind == "knots", KNOTS, POINT))
        hlr = np.asarray(get("hlr", np.zeros(n)), float)
        sersic = get("sersic", np.ones(n))
        q = get("q", np.ones(n))
        if self.apply_dc2_dilation:
            # size -> semi-major axis: dilate by sqrt(a/b) = q^-1/2
            # (imsim/skycat.py apply_dc2_dilation; galaxy rows only)
            gal_row = obj_type != POINT
            qc = np.clip(np.asarray(q, float), 0.05, 1.0)
            hlr = np.where(gal_row, hlr / np.sqrt(qc), hlr)
        beta = get("beta", np.zeros(n)) * DEG
        g1 = get("g1", np.zeros(n))
        g2 = get("g2", np.zeros(n))
        kappa = get("kappa", np.zeros(n))
        g1r = g1 / (1.0 - kappa)
        g2r = g2 / (1.0 - kappa)
        mu = 1.0 / np.maximum((1.0 - kappa) ** 2 - (g1**2 + g2**2), 1e-6)

        sed = get("sed", np.array(["flatSED/sed_flat.txt"] * n,
                                  object))
        tab = ObjectTable(
            id=np.asarray(get("id", np.arange(n)), object),
            ra=ra, dec=dec, x=np.zeros(n), y=np.zeros(n),
            magnorm=np.asarray(get("magnorm", np.full(n, 25.0)),
                               float),
            obj_type=obj_type.astype(np.int32),
            p0=np.asarray(hlr, float),
            # p1: Sersic index for galaxies, n_knots for knots rows
            p1=np.where(obj_type == KNOTS,
                        np.maximum(np.asarray(sersic, float), 1.0),
                        np.clip(np.asarray(sersic, float), 0.3, 6.2)),
            p2=np.clip(np.asarray(q, float), 0.05, 1.0),
            p3=np.asarray(beta, float),
            g1=g1r, g2=g2r, mu=mu,
            sed_name=np.asarray(sed, object),
            redshift=np.asarray(get("redshift", np.zeros(n)), float),
            int_av=np.zeros(n), int_rv=np.full(n, 3.1),
            mw_av=np.asarray(get("mw_av", np.zeros(n)), float),
            mw_rv=np.asarray(get("mw_rv", np.full(n, 3.1)), float),
            image_file=np.array([""] * n, object),
        )
        tab = tab.select(keep_kind)
        if wcs is not None and len(tab):
            x, y = wcs.radec_to_xy(tab.ra, tab.dec)
            tab.x, tab.y = np.asarray(x, float), np.asarray(y, float)
            keep = ((tab.x >= -edge_pix) & (tab.x <= xsize + edge_pix)
                    & (tab.y >= -edge_pix) & (tab.y <= ysize + edge_pix))
            tab = tab.select(keep)
        if logger:
            logger.info("skycat: %d objects kept", len(tab))
        return tab

    def getNObjects(self):
        if self.native is not None:
            return len(self.native.get_objects_by_region(
                None, obj_types=self.obj_types))
        return len(self.df)
