"""Host-side utilities: box math, drawing, threaded video I/O, timing."""
