"""Host-side file I/O: FITS headers, images, netCDF/CDF containers.

These feed device arrays; none of this code runs in the jit'd compute path.
"""
