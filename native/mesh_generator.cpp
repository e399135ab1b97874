// mesh_generator: build an MFEM v1.0 hex mesh from a voxel grain map.
//
// Native-tool parity with the reference's scripts/meshing/mesh_generator.cpp
// (which links MFEM); this standalone version writes the MFEM v1.0 text
// format directly -- element attributes are grain ids, boundary quads carry
// the ExaConstit attribute convention:
//   z_min = 1, x_min = 2, y_min = 3, z_max = 4, x_max = 5, y_max = 6
//
// Usage:
//   mesh_generator -nx NX -ny NY -nz NZ [-lx LX -ly LY -lz LZ]
//                  [-grain_map grains.txt] [-ncols 1] [-col 0]
//                  [-o out.mesh]
// The grain map is whitespace-separated, one row per element (x fastest,
// then y, then z), grain id in column `col` of `ncols` columns.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

int main(int argc, char** argv) {
  int nx = 1, ny = 1, nz = 1, ncols = 1, col = 0;
  double lx = 1.0, ly = 1.0, lz = 1.0;
  std::string grain_file, out_file = "exaconstit.mesh";

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) {
        std::cerr << "missing value for " << a << "\n";
        std::exit(1);
      }
      return argv[++i];
    };
    if (a == "-nx") nx = std::atoi(next());
    else if (a == "-ny") ny = std::atoi(next());
    else if (a == "-nz") nz = std::atoi(next());
    else if (a == "-lx") lx = std::atof(next());
    else if (a == "-ly") ly = std::atof(next());
    else if (a == "-lz") lz = std::atof(next());
    else if (a == "-grain_map") grain_file = next();
    else if (a == "-ncols") ncols = std::atoi(next());
    else if (a == "-col") col = std::atoi(next());
    else if (a == "-o") out_file = next();
    else {
      std::cerr << "unknown option " << a << "\n";
      return 1;
    }
  }

  const long ne = (long)nx * ny * nz;
  std::vector<long> attr(ne, 1);
  if (!grain_file.empty()) {
    std::ifstream gf(grain_file);
    if (!gf) {
      std::cerr << "cannot open grain map " << grain_file << "\n";
      return 1;
    }
    std::vector<double> vals;
    double v;
    while (gf >> v) vals.push_back(v);
    if ((long)vals.size() < ne * ncols) {
      std::cerr << "grain map too short: " << vals.size() << " < "
                << ne * ncols << "\n";
      return 1;
    }
    for (long e = 0; e < ne; ++e) attr[e] = (long)vals[e * ncols + col];
  }

  const long npx = nx + 1, npy = ny + 1, npz = nz + 1;
  auto vid = [&](long i, long j, long k) { return i + npx * (j + npy * k); };

  std::ofstream f(out_file);
  f << "MFEM mesh v1.0\n\ndimension\n3\n\nelements\n" << ne << "\n";
  // MFEM hex vertex order: (0,0,0),(1,0,0),(1,1,0),(0,1,0),
  //                        (0,0,1),(1,0,1),(1,1,1),(0,1,1)
  long e = 0;
  for (long k = 0; k < nz; ++k)
    for (long j = 0; j < ny; ++j)
      for (long i = 0; i < nx; ++i, ++e) {
        f << attr[e] << " 5 " << vid(i, j, k) << ' ' << vid(i + 1, j, k)
          << ' ' << vid(i + 1, j + 1, k) << ' ' << vid(i, j + 1, k) << ' '
          << vid(i, j, k + 1) << ' ' << vid(i + 1, j, k + 1) << ' '
          << vid(i + 1, j + 1, k + 1) << ' ' << vid(i, j + 1, k + 1)
          << "\n";
      }

  const long nbdr = 2L * (nx * ny + ny * nz + nx * nz);
  f << "\nboundary\n" << nbdr << "\n";
  // z_min = 1, z_max = 4
  for (long j = 0; j < ny; ++j)
    for (long i = 0; i < nx; ++i) {
      f << "1 3 " << vid(i, j, 0) << ' ' << vid(i + 1, j, 0) << ' '
        << vid(i + 1, j + 1, 0) << ' ' << vid(i, j + 1, 0) << "\n";
      f << "4 3 " << vid(i, j, nz) << ' ' << vid(i + 1, j, nz) << ' '
        << vid(i + 1, j + 1, nz) << ' ' << vid(i, j + 1, nz) << "\n";
    }
  // x_min = 2, x_max = 5
  for (long k = 0; k < nz; ++k)
    for (long j = 0; j < ny; ++j) {
      f << "2 3 " << vid(0, j, k) << ' ' << vid(0, j + 1, k) << ' '
        << vid(0, j + 1, k + 1) << ' ' << vid(0, j, k + 1) << "\n";
      f << "5 3 " << vid(nx, j, k) << ' ' << vid(nx, j + 1, k) << ' '
        << vid(nx, j + 1, k + 1) << ' ' << vid(nx, j, k + 1) << "\n";
    }
  // y_min = 3, y_max = 6
  for (long k = 0; k < nz; ++k)
    for (long i = 0; i < nx; ++i) {
      f << "3 3 " << vid(i, 0, k) << ' ' << vid(i + 1, 0, k) << ' '
        << vid(i + 1, 0, k + 1) << ' ' << vid(i, 0, k + 1) << "\n";
      f << "6 3 " << vid(i, ny, k) << ' ' << vid(i + 1, ny, k) << ' '
        << vid(i + 1, ny, k + 1) << ' ' << vid(i, ny, k + 1) << "\n";
    }

  f << "\nvertices\n" << npx * npy * npz << "\n3\n";
  for (long k = 0; k < npz; ++k)
    for (long j = 0; j < npy; ++j)
      for (long i = 0; i < npx; ++i)
        f << (lx * i) / nx << ' ' << (ly * j) / ny << ' ' << (lz * k) / nz
          << "\n";

  std::cout << "wrote " << out_file << ": " << ne << " hexes, " << nbdr
            << " boundary quads\n";
  return 0;
}
