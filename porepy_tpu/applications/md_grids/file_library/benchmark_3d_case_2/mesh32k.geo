h = 0.045;
Geometry.Tolerance = 1e-05;
Mesh.Algorithm = 8;
Merge "benchmark_3d_case_2_geometry.geo";