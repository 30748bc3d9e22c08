# Copyright (c) 2026
# MIT License
"""Geoid undulation (EGM96 / GEOID12A) for orthometric -> ellipsoidal heights.

Equivalent of reference ``horayzon/geoid.py`` (undulation geoid.py:16-129):
downloads the gridded geoid model on first use, then bilinearly interpolates
the undulation to the requested lon/lat axes.
"""

import gzip
import os
import zipfile

import numpy as np
from scipy import interpolate

from horayzon_tpu.auxiliary import get_path_aux_data
from horayzon_tpu.download import file as download_file

_SPAT_COV = {"EGM96": (-180.0, 180.0, -90.0, 90.0),
             "GEOID12A": (-180.0, -126.0, 49.0, 72.0)}


def undulation(lon_ip, lat_ip, geoid="EGM96"):
    """Geoid undulation [m] on the tensor grid ``lat_ip x lon_ip``.

    Mirrors reference geoid.py:16-129 (EGM96 15-arcmin global grid;
    GEOID12A 1-arcmin Alaska grid); bilinear interpolation.
    """
    lon_ip = np.asarray(lon_ip, dtype=np.float64)
    lat_ip = np.asarray(lat_ip, dtype=np.float64)
    if geoid not in ("EGM96", "GEOID12A"):
        raise NotImplementedError("geoid " + geoid + " is not supported")
    cov = _SPAT_COV[geoid]
    if (lon_ip.min() < cov[0] or lon_ip.max() > cov[1]
            or lat_ip.min() < cov[2] or lat_ip.max() > cov[3]):
        raise ValueError("selected domain exceeds spatial coverage")
    if not np.all(np.diff(lon_ip) > 0.0):
        raise ValueError("longitude values are not monotonically increasing")
    if sum((np.all(np.diff(lat_ip) > 0.0),
            np.all(np.diff(lat_ip) < 0.0))) != 1:
        raise ValueError("latitude values are not monotonic")

    lat_dec = lat_ip.size > 1 and lat_ip[1] < lat_ip[0]
    if lat_dec:
        lat_ip = lat_ip[::-1]

    path_aux_data = get_path_aux_data()
    data_ip = np.empty((len(lat_ip), len(lon_ip)), dtype=np.float64)
    if geoid == "EGM96":
        if not os.path.isdir(path_aux_data + "EGM96"):
            file_url = ("https://earth-info.nga.mil/php/"
                        "download.php?file=egm-96interpolation")
            print("Download EGM96 data:")
            download_file(file_url, path_aux_data)
            file_zipped = path_aux_data + os.path.split(file_url)[-1]
            with zipfile.ZipFile(file_zipped, "r") as zip_ref:
                zip_ref.extractall(path_aux_data + "EGM96")
            os.remove(file_zipped)
        data = np.fromfile(path_aux_data + "EGM96/WW15MGH.GRD", sep=" ",
                           dtype=np.float32)[6:]
        data = data.reshape(int(180 / 0.25) + 1, int(360 / 0.25) + 1)
        lon = np.linspace(0.0, 360.0, data.shape[1], dtype=np.float32)
        lat = np.linspace(90.0, -90.0, data.shape[0], dtype=np.float32)
        # Rearrange longitudes to [-180, +180] (geoid.py:88-90)
        lon_ra = np.append(lon[720:] - 360.0, lon[1:721])
        data_ra = np.hstack((data[:, 720:], data[:, 1:721]))
        f_ip = interpolate.RectBivariateSpline(lat[::-1], lon_ra,
                                               np.flipud(data_ra),
                                               kx=1, ky=1)
        data_ip[:] = f_ip(lat_ip, lon_ip)
    else:  # GEOID12A
        if not os.path.isdir(path_aux_data + "GEOID12A"):
            os.makedirs(path_aux_data + "GEOID12A/", exist_ok=True)
            file_url = ("https://www.ngs.noaa.gov/PC_PROD/GEOID12A/"
                        "Format_ascii/g2012aa0.asc.gz")
            print("Download GEOID12A data:")
            download_file(file_url, path_aux_data + "GEOID12A/")
        txt = gzip.open(path_aux_data + "GEOID12A/g2012aa0.asc.gz",
                        "r").read().decode("utf-8")
        data = np.fromstring("".join(txt.splitlines()), dtype=np.float32,
                             sep=" ")[7:]
        data = data.reshape(1381, 3721)
        lon = np.linspace(-188.0,
                          -188.0 + 0.1666666666667e-01 * (data.shape[1] - 1),
                          data.shape[1], dtype=np.float32)
        lat = np.linspace(49.0,
                          49.0 + 0.1666666666667e-01 * (data.shape[0] - 1),
                          data.shape[0], dtype=np.float32)
        f_ip = interpolate.RectBivariateSpline(lat, lon, data, kx=1, ky=1)
        data_ip[:] = f_ip(lat_ip, lon_ip)

    if lat_dec:
        data_ip = np.flipud(data_ip)
    return data_ip
