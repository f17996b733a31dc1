// chemprop_tpu native batch featurizer
//
// C++ equivalent of the cuik-molmaker dependency used by the reference
// (reference chemprop/featurizers/molgraph/molecule.py:127-257): parses a
// whole list of SMILES and emits pre-batched, feature-ready arrays in one
// call, bypassing the per-molecule Python loop. The chemistry model is a
// 1:1 port of the in-repo Python substrate (chemprop_tpu/chem/*): same
// OpenSMILES grammar subset, same perception rules (bridge-based rings,
// Huckel 4n+2 aromatization, Daylight implicit-H valences, conjugation,
// VSEPR hybridization, directional-bond stereo), and the same multi-hot
// feature layout (V2 72-dim atoms / 14-dim bonds), so outputs are
// bit-identical to the Python featurizer (enforced by parity tests).
//
// Build:  g++ -O3 -shared -fPIC -std=c++17 featurizer.cpp -o libcptpu_featurizer.so
// API: see extern "C" block at the bottom (ctypes-friendly, no pybind11).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <set>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------- periodic table
const char* SYMBOLS[] = {
    "*",  "H",  "He", "Li", "Be", "B",  "C",  "N",  "O",  "F",  "Ne", "Na", "Mg",
    "Al", "Si", "P",  "S",  "Cl", "Ar", "K",  "Ca", "Sc", "Ti", "V",  "Cr", "Mn",
    "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr",
    "Y",  "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sn", "Sb",
    "Te", "I",  "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd", "Pm", "Sm", "Eu", "Gd",
    "Tb", "Dy", "Ho", "Er", "Tm", "Yb", "Lu", "Hf", "Ta", "W",  "Re", "Os", "Ir",
    "Pt", "Au", "Hg", "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U",  "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm", "Md", "No", "Lr",
    "Rf", "Db", "Sg", "Bh", "Hs", "Mt", "Ds", "Rg", "Cn", "Nh", "Fl", "Mc", "Lv",
    "Ts", "Og"};
const int N_ELEM = sizeof(SYMBOLS) / sizeof(SYMBOLS[0]);

const double MASSES[] = {
    0.0,     1.008,   4.003,   6.941,   9.012,   10.811,  12.011,  14.007,  15.999,
    18.998,  20.180,  22.990,  24.305,  26.982,  28.086,  30.974,  32.067,  35.453,
    39.948,  39.098,  40.078,  44.956,  47.867,  50.942,  51.996,  54.938,  55.845,
    58.933,  58.693,  63.546,  65.39,   69.723,  72.61,   74.922,  78.96,   79.904,
    83.80,   85.468,  87.62,   88.906,  91.224,  92.906,  95.94,   98.0,    101.07,
    102.906, 106.42,  107.868, 112.412, 114.818, 118.711, 121.760, 127.60,  126.904,
    131.29,  132.905, 137.328, 138.906, 140.116, 140.908, 144.24,  145.0,   150.36,
    151.964, 157.25,  158.925, 162.50,  164.930, 167.26,  168.934, 173.04,  174.967,
    178.49,  180.948, 183.84,  186.207, 190.23,  192.217, 195.078, 196.967, 200.59,
    204.383, 207.2,   208.980, 209.0,   210.0,   222.0,   223.0,   226.0,   227.0,
    232.038, 231.036, 238.029, 237.0,   244.0,   243.0,   247.0,   247.0,   251.0,
    252.0,   257.0,   258.0,   259.0,   262.0,   267.0,   268.0,   269.0,   270.0,
    269.0,   278.0,   281.0,   281.0,   285.0,   286.0,   289.0,   289.0,   293.0,
    294.0,   294.0};

int atomic_num(const std::string& sym) {
  for (int i = 0; i < N_ELEM; i++)
    if (sym == SYMBOLS[i]) return i;
  return -1;
}

// default valences, lowest first (chem/periodic_table.py DEFAULT_VALENCES)
std::vector<int> default_valences(int z) {
  switch (z) {
    case 1: case 3: case 9: case 11: case 17: case 19: case 35: case 37: case 55:
      return {1};
    case 2: case 10: case 18: case 36: return {0};
    case 4: case 12: case 20: case 38: case 56: return {2};
    case 5: case 13: case 31: return {3};
    case 6: case 14: case 32: return {4};
    case 7: return {3};
    case 8: return {2};
    case 15: case 33: return {3, 5};
    case 16: case 34: case 52: return {2, 4, 6};
    case 53: return {1, 3, 5};
    case 54: return {0, 2};
  }
  return {};
}

int n_outer_electrons(int z) {
  if (z <= 0) return 0;
  if (z <= 2) return z;
  if (z >= 3 && z <= 10) return z - 2;
  if (z >= 11 && z <= 18) return z - 10;
  auto in = [&](int a, int b) { return z >= a && z <= b; };
  if (in(19, 36) || in(37, 54)) {
    int start = z <= 36 ? 19 : 37;
    int col = z - start + 1;
    if (col <= 2) return col;
    if (col >= 13) return col - 10;
    return 0;
  }
  if (in(55, 86) || in(87, 118)) {
    int start = z <= 86 ? 55 : 87;
    int col = z - start + 1;
    if (col <= 2) return col;
    if (col >= 27) return col - 24;
    return 0;
  }
  return 0;
}

// ------------------------------------------------------------------ Mol rep
enum BondOrder { SINGLE = 1, DOUBLE = 2, TRIPLE = 3, QUAD = 4, AROMATIC = 12 };
enum Hyb { H_UNSPEC = 0, H_S = 1, H_SP = 2, H_SP2 = 3, H_SP3 = 4, H_SP2D = 5, H_SP3D = 6, H_SP3D2 = 7, H_OTHER = 8 };
enum Stereo { S_NONE = 0, S_ANY = 1, S_Z = 2, S_E = 3 };
enum Dir { D_NONE = 0, D_UP = 1, D_DOWN = 2 };

struct Atom {
  int z = 0;
  int charge = 0;
  bool aromatic = false;
  int explicit_hs = -1;  // -1 = implicit (organic subset)
  int isotope = 0;
  int chiral = 0;  // 0 none, 1 CW(@@), 2 CCW(@), 3 other
  int map_num = 0;
  int implicit_hs = 0;
  int hyb = H_UNSPEC;
  bool in_ring = false;
};

struct Bond {
  int u, v;
  int order = SINGLE;
  bool aromatic = false;
  bool conjugated = false;
  bool in_ring = false;
  int stereo = S_NONE;
  int dir = D_NONE;
  bool implicit_arom = false;  // written bond-less between aromatic atoms
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int>> adj;  // atom -> bond indices

  int add_atom(const Atom& a) {
    atoms.push_back(a);
    adj.emplace_back();
    return (int)atoms.size() - 1;
  }
  int add_bond(int u, int v, int order) {
    Bond b;
    b.u = u; b.v = v; b.order = order;
    bonds.push_back(b);
    adj[u].push_back((int)bonds.size() - 1);
    adj[v].push_back((int)bonds.size() - 1);
    return (int)bonds.size() - 1;
  }
  int other(int bi, int a) const { return bonds[bi].u == a ? bonds[bi].v : bonds[bi].u; }
  int degree(int a) const { return (int)adj[a].size(); }
  int total_hs(int a) const {
    return (atoms[a].explicit_hs > 0 ? atoms[a].explicit_hs : 0) + atoms[a].implicit_hs;
  }
  int total_degree(int a) const { return degree(a) + total_hs(a); }
};

// ------------------------------------------------------------- SMILES parse
struct ParseError {
  std::string msg;
};

bool is_organic(const std::string& s) {
  static const std::set<std::string> org = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I", "*"};
  return org.count(s) > 0;
}

bool is_aromatic_sym(const std::string& s) {
  static const std::set<std::string> ar = {"b", "c", "n", "o", "p", "s", "se", "as", "te", "si"};
  return ar.count(s) > 0;
}

Atom parse_bracket(const std::string& s, size_t start, size_t end) {
  size_t i = start;
  Atom a;
  a.explicit_hs = 0;
  while (i < end && isdigit(s[i])) a.isotope = a.isotope * 10 + (s[i++] - '0');
  if (i >= end) throw ParseError{"bracket atom missing symbol"};
  std::string sym;
  if (i + 1 < end && isupper(s[i]) && islower(s[i + 1]) &&
      atomic_num(s.substr(i, 2)) > 0) {
    sym = s.substr(i, 2);
  } else if (i + 1 < end && islower(s[i]) && is_aromatic_sym(s.substr(i, 2))) {
    sym = s.substr(i, 2);
    a.aromatic = true;
  }
  if (sym.empty()) {
    sym = s.substr(i, 1);
    if (islower(s[i])) {
      if (!is_aromatic_sym(sym)) throw ParseError{"cannot be aromatic: " + sym};
      a.aromatic = true;
    }
  }
  i += sym.size();
  if (a.aromatic) sym[0] = toupper(sym[0]);
  if (sym == "*") a.z = 0;
  else {
    a.z = atomic_num(sym);
    if (a.z < 0) throw ParseError{"unknown element " + sym};
  }
  if (i < end && s[i] == '@') {
    if (i + 1 < end && s[i + 1] == '@') { a.chiral = 1; i += 2; }
    else { a.chiral = 2; i += 1; }
    static const char* classes[] = {"TH", "AL", "SP", "TB", "OH"};
    for (auto cls : classes)
      if (s.compare(i, 2, cls) == 0) {
        a.chiral = 3;
        i += 2;
        while (i < end && isdigit(s[i])) i++;
        break;
      }
  }
  if (i < end && s[i] == 'H') {
    i++;
    int h = 1;
    if (i < end && isdigit(s[i])) {
      h = 0;
      while (i < end && isdigit(s[i])) h = h * 10 + (s[i++] - '0');
    }
    a.explicit_hs = h;
  }
  if (i < end && (s[i] == '+' || s[i] == '-')) {
    int sign = s[i] == '+' ? 1 : -1;
    char c = s[i];
    i++;
    int mag = 1;
    if (i < end && isdigit(s[i])) {
      mag = 0;
      while (i < end && isdigit(s[i])) mag = mag * 10 + (s[i++] - '0');
    } else {
      while (i < end && s[i] == c) { mag++; i++; }
    }
    a.charge = sign * mag;
  }
  if (i < end && s[i] == ':') {
    i++;
    int m = 0;
    while (i < end && isdigit(s[i])) m = m * 10 + (s[i++] - '0');
    a.map_num = m;
  }
  if (i != end) throw ParseError{"unexpected bracket content"};
  return a;
}

Mol parse_smiles(const std::string& s) {
  Mol mol;
  int prev = -1;
  std::vector<int> stack;
  int pending_order = -1;  // -1 = implicit
  int pending_dir = D_NONE;
  struct RC { int atom; int order; int dir; };
  std::map<int, RC> ring;
  // closing atom -> ring digits closed there, in appearance order (for the
  // RDKit chirality parity quirk below)
  std::map<int, std::vector<int>> closed_digits;

  auto flip = [](int d) { return d == D_UP ? D_DOWN : d == D_DOWN ? D_UP : d; };
  auto make_bond = [&](int u, int v, int order, int dir) {
    bool implicit = order < 0;
    if (implicit)
      order = (mol.atoms[u].aromatic && mol.atoms[v].aromatic) ? AROMATIC : SINGLE;
    for (int bi : mol.adj[u])
      if (mol.other(bi, u) == v) throw ParseError{"duplicate bond"};
    if (u == v) throw ParseError{"self bond"};
    int bi = mol.add_bond(u, v, order);
    mol.bonds[bi].dir = dir;
    if (implicit && order == AROMATIC) mol.bonds[bi].implicit_arom = true;
  };

  size_t i = 0, n = s.size();
  while (i < n) {
    char c = s[i];
    if (c == '(') {
      if (prev < 0) throw ParseError{"branch with no root"};
      stack.push_back(prev);
      i++;
    } else if (c == ')') {
      if (stack.empty()) throw ParseError{"unmatched )"};
      prev = stack.back();
      stack.pop_back();
      i++;
    } else if (c == '.') {
      prev = -1; pending_order = -1; pending_dir = D_NONE; i++;
    } else if (c == '-') { pending_order = SINGLE; i++; }
    else if (c == '=') { pending_order = DOUBLE; i++; }
    else if (c == '#') { pending_order = TRIPLE; i++; }
    else if (c == '$') { pending_order = QUAD; i++; }
    else if (c == ':') { pending_order = AROMATIC; i++; }
    else if (c == '/') { pending_order = SINGLE; pending_dir = D_UP; i++; }
    else if (c == '\\') { pending_order = SINGLE; pending_dir = D_DOWN; i++; }
    else if (isdigit(c) || c == '%') {
      if (prev < 0) throw ParseError{"ring closure with no atom"};
      int num;
      if (c == '%') {
        if (i + 2 >= n || !isdigit(s[i + 1]) || !isdigit(s[i + 2]))
          throw ParseError{"% needs two digits"};
        num = (s[i + 1] - '0') * 10 + (s[i + 2] - '0');
        i += 3;
      } else { num = c - '0'; i++; }
      auto it = ring.find(num);
      if (it != ring.end()) {
        RC rc = it->second;
        ring.erase(it);
        int order = rc.order;
        if (order < 0) order = pending_order;
        else if (pending_order >= 0 && pending_order != order)
          throw ParseError{"conflicting ring bond orders"};
        int dir = pending_dir != D_NONE ? pending_dir : flip(rc.dir);
        make_bond(rc.atom, prev, order, dir);
        closed_digits[prev].push_back(num);
      } else {
        ring[num] = {prev, pending_order, pending_dir};
      }
      pending_order = -1; pending_dir = D_NONE;
    } else if (c == '[') {
      size_t j = s.find(']', i);
      if (j == std::string::npos) throw ParseError{"unclosed bracket"};
      Atom a = parse_bracket(s, i + 1, j);
      int idx = mol.add_atom(a);
      if (prev >= 0) make_bond(prev, idx, pending_order, pending_dir);
      prev = idx; pending_order = -1; pending_dir = D_NONE;
      i = j + 1;
    } else if (c == '*') {
      Atom a; a.z = 0; a.explicit_hs = 0;
      int idx = mol.add_atom(a);
      if (prev >= 0) make_bond(prev, idx, pending_order, pending_dir);
      prev = idx; pending_order = -1; pending_dir = D_NONE;
      i++;
    } else {
      std::string sym;
      if (i + 1 < n && (s.compare(i, 2, "Cl") == 0 || s.compare(i, 2, "Br") == 0))
        sym = s.substr(i, 2);
      else
        sym = s.substr(i, 1);
      bool arom = islower(sym[0]);
      std::string lookup = sym;
      if (arom) {
        if (!is_aromatic_sym(sym)) throw ParseError{"unknown atom symbol " + sym};
        lookup[0] = toupper(lookup[0]);
      }
      if (!is_organic(lookup)) throw ParseError{"unknown atom symbol " + sym};
      Atom a;
      a.z = atomic_num(lookup);
      a.aromatic = arom;
      int idx = mol.add_atom(a);
      if (prev >= 0) make_bond(prev, idx, pending_order, pending_dir);
      prev = idx; pending_order = -1; pending_dir = D_NONE;
      i += sym.size();
    }
  }
  if (!stack.empty()) throw ParseError{"unclosed branch"};
  if (!ring.empty()) throw ParseError{"unclosed ring closure"};
  // RDKit parity quirk (mirrors chem/smiles.py): when one atom CLOSES
  // several rings, RDKit's effective neighbor order for tetrahedral parity
  // has those ring bonds sorted by ring DIGIT, not appearance —
  // [C@]21[H] flips relative to [C@]12[H].
  for (auto& [atom_idx, nums] : closed_digits) {
    Atom& at = mol.atoms[atom_idx];
    if (nums.size() < 2 || (at.chiral != 1 && at.chiral != 2)) continue;
    int swaps = 0;
    std::vector<int> v = nums;
    for (size_t a = 0; a + 1 < v.size(); a++)  // bubble count = parity
      for (size_t b2 = 0; b2 + 1 < v.size() - a; b2++)
        if (v[b2] > v[b2 + 1]) { std::swap(v[b2], v[b2 + 1]); swaps++; }
    if (swaps % 2 == 1) at.chiral = at.chiral == 1 ? 2 : 1;
  }
  return mol;
}

// -------------------------------------------------------------- perception
void find_bridges(const Mol& mol, std::vector<char>& is_bridge) {
  int n = (int)mol.atoms.size();
  std::vector<int> disc(n, -1), low(n, 0);
  is_bridge.assign(mol.bonds.size(), 0);
  int timer = 0;
  struct Frame { int u, pbond; size_t it; };
  for (int root = 0; root < n; root++) {
    if (disc[root] != -1) continue;
    std::vector<Frame> st{{root, -1, 0}};
    disc[root] = low[root] = timer++;
    while (!st.empty()) {
      Frame& f = st.back();
      bool advanced = false;
      while (f.it < mol.adj[f.u].size()) {
        int bi = mol.adj[f.u][f.it++];
        if (bi == f.pbond) continue;
        int v = mol.other(bi, f.u);
        if (disc[v] == -1) {
          disc[v] = low[v] = timer++;
          st.push_back({v, bi, 0});
          advanced = true;
          break;
        }
        low[f.u] = std::min(low[f.u], disc[v]);
      }
      if (!advanced) {
        int u = f.u, pbond = f.pbond;
        st.pop_back();
        if (!st.empty()) {
          int p = st.back().u;
          low[p] = std::min(low[p], low[u]);
          if (low[u] > disc[p]) is_bridge[pbond] = 1;
        }
      }
    }
  }
}

std::vector<std::vector<int>> perceive_rings(Mol& mol) {
  std::vector<char> bridge;
  find_bridges(mol, bridge);
  for (size_t i = 0; i < mol.bonds.size(); i++) mol.bonds[i].in_ring = !bridge[i];
  for (auto& b : mol.bonds)
    if (b.in_ring) { mol.atoms[b.u].in_ring = true; mol.atoms[b.v].in_ring = true; }

  // smallest ring through each ring bond (BFS), dedup
  std::vector<std::vector<int>> rings;
  std::set<std::vector<int>> seen;
  for (size_t bi = 0; bi < mol.bonds.size(); bi++) {
    if (!mol.bonds[bi].in_ring) continue;
    int src = mol.bonds[bi].u, dst = mol.bonds[bi].v;
    std::vector<int> prev(mol.atoms.size(), -2);
    prev[src] = -1;
    std::vector<int> q{src};
    for (size_t qi = 0; qi < q.size(); qi++) {
      int u = q[qi];
      if (u == dst) break;
      for (int b2 : mol.adj[u]) {
        if ((int)bi == b2) continue;
        int v = mol.other(b2, u);
        if (prev[v] == -2) { prev[v] = u; q.push_back(v); }
      }
    }
    if (prev[dst] == -2) continue;
    std::vector<int> path;
    for (int x = dst; x != -1; x = prev[x]) path.push_back(x);
    if (path.size() > 24) continue;
    std::vector<int> key = path;
    std::sort(key.begin(), key.end());
    if (seen.insert(key).second) rings.push_back(path);
  }
  return rings;
}

void resolve_implicit_aromatic(Mol& mol) {
  for (auto& b : mol.bonds)
    if (b.implicit_arom && !b.in_ring) b.order = SINGLE;
}

// RDKit MolOps::cleanUp equivalent (chem/perception.py cleanup_hypervalent):
// charge-separate neutral hypervalent nitro/N-oxide, azide, halogen oxides
void cleanup_hypervalent(Mol& mol) {
  auto order_sum = [&](int a) {
    double t = 0;
    for (int bi : mol.adj[a]) {
      int o = mol.bonds[bi].order;
      t += o == AROMATIC ? 1.5 : o;
    }
    return t;
  };
  auto terminal_dbl_O = [&](int a) {
    std::vector<int> out;
    for (int bi : mol.adj[a]) {
      int j = mol.other(bi, a);
      if (mol.bonds[bi].order == DOUBLE && mol.atoms[j].z == 8 &&
          mol.degree(j) == 1 && mol.atoms[j].charge == 0)
        out.push_back(bi);
    }
    return out;
  };
  for (size_t a = 0; a < mol.atoms.size(); a++) {
    Atom& at = mol.atoms[a];
    if (at.charge != 0) continue;
    int z = at.z;
    if (z == 7) {
      auto dbl = terminal_dbl_O((int)a);
      while (order_sum((int)a) > 3 + at.charge && !dbl.empty()) {
        int bi = dbl.back();
        dbl.pop_back();
        mol.bonds[bi].order = SINGLE;
        mol.atoms[mol.other(bi, (int)a)].charge = -1;
        at.charge += 1;
      }
      if (at.charge == 0 && mol.degree((int)a) == 2) {
        bool all_dbl_N = true;
        for (int bi : mol.adj[a])
          all_dbl_N &= mol.bonds[bi].order == DOUBLE &&
                       mol.atoms[mol.other(bi, (int)a)].z == 7;
        if (all_dbl_N) {
          int term = -1;
          for (int bi : mol.adj[a]) {
            int j = mol.other(bi, (int)a);
            if (mol.degree(j) == 1 && mol.atoms[j].charge == 0) term = j;
          }
          if (term >= 0) {
            at.charge = 1;
            mol.atoms[term].charge = -1;
          }
        }
      }
    } else if (z == 17 || z == 35 || z == 53) {
      auto dbl = terminal_dbl_O((int)a);
      while (order_sum((int)a) > 1 + at.charge && !dbl.empty()) {
        int bi = dbl.back();
        dbl.pop_back();
        mol.bonds[bi].order = SINGLE;
        mol.atoms[mol.other(bi, (int)a)].charge = -1;
        at.charge += 1;
      }
    }
  }
}

double eff_order_sum(const Mol& mol, int a) {
  const Atom& at = mol.atoms[a];
  bool chalc_arom = at.aromatic && (at.z == 8 || at.z == 16 || at.z == 34 || at.z == 52);
  double total = 0;
  for (int bi : mol.adj[a]) {
    int o = mol.bonds[bi].order;
    if (o == AROMATIC) total += chalc_arom ? 1.0 : 1.5;
    else total += o;
  }
  return total;
}

void assign_implicit_h(Mol& mol) {
  for (size_t a = 0; a < mol.atoms.size(); a++) {
    Atom& at = mol.atoms[a];
    if (at.explicit_hs >= 0) { at.implicit_hs = 0; continue; }
    auto vals = default_valences(at.z);
    if (vals.empty()) { at.implicit_hs = 0; continue; }
    // charge shifts allowed valence (chem/perception.py): N+ -> 4, O- -> 1,
    // C+/C- -> 3, B loses with charge
    if (at.charge != 0) {
      int shift = at.z == 6 ? -std::abs(at.charge)
                  : at.z == 5 ? -at.charge
                              : at.charge;
      for (auto& dv : vals) dv = std::max(0, dv + shift);
    }
    int v = (int)std::ceil(eff_order_sum(mol, (int)a) - 1e-9);
    at.implicit_hs = 0;
    for (int dv : vals)
      if (dv >= v) { at.implicit_hs = dv - v; break; }
  }
}

int pi_contribution(const Mol& mol, int a, const std::set<int>& ring_set) {
  const Atom& at = mol.atoms[a];
  bool in_ring_multiple = false;
  int exo_bond = -1;
  for (int bi : mol.adj[a]) {
    int o = mol.bonds[bi].order;
    if (o == DOUBLE || o == TRIPLE || o == AROMATIC) {
      if (ring_set.count(mol.other(bi, a))) in_ring_multiple = true;
      else exo_bond = bi;
    }
  }
  if (in_ring_multiple) return 1;
  if (exo_bond >= 0) {
    // RDKit getAtomContrib semantics (mirrors chem/perception.py): the atom
    // stays a candidate (0 electrons, 2-pyridone style) only when the
    // exocyclic multiple bond is acyclic and goes from carbon to an
    // electronegative heteroatom; a cyclic multiple bond into another ring
    // of the fused system, or a bond to carbon, disqualifies the ring.
    if (mol.bonds[exo_bond].in_ring) return -1000;
    int zo = mol.atoms[mol.other(exo_bond, a)].z;
    if (at.z == 6 && (zo == 7 || zo == 8 || zo == 15 || zo == 16 || zo == 34)) return 0;
    return -1000;
  }
  int z = at.z, q = at.charge;
  if (z == 6) return q == -1 ? 2 : q == 1 ? 0 : -1000;
  if (z == 7 || z == 15) return (q == 0 || q == -1) ? 2 : -1000;
  if (z == 8 || z == 16 || z == 34 || z == 52) return (q == 0 || q == 1) ? 2 : -1000;
  if (z == 5) return 0;
  return -1000;
}

void aromatize(Mol& mol, const std::vector<std::vector<int>>& rings) {
  bool changed = true;
  while (changed) {
    changed = false;
    for (auto& ring : rings) {
      if (ring.size() < 5 || ring.size() > 7) continue;
      bool all_arom = true;
      for (int a : ring) all_arom &= mol.atoms[a].aromatic;
      if (all_arom) continue;
      std::set<int> rs(ring.begin(), ring.end());
      int pi = 0;
      bool ok = true;
      for (int a : ring) {
        if (mol.total_degree(a) > 3) { ok = false; break; }
        int c = pi_contribution(mol, a, rs);
        if (c < -100) { ok = false; break; }
        pi += c;
      }
      if (!ok || pi < 2 || (pi - 2) % 4 != 0) continue;
      for (int a : ring) mol.atoms[a].aromatic = true;
      for (int a : ring)
        for (int bi : mol.adj[a])
          if (rs.count(mol.other(bi, a)) && mol.bonds[bi].in_ring) {
            mol.bonds[bi].order = AROMATIC;
            mol.bonds[bi].aromatic = true;
          }
      changed = true;
    }
  }
  // an AROMATIC bond must lie in a ring whose bonds are all aromatic; ring
  // linkers between aromatic systems kekulize to SINGLE (RDKit behavior,
  // chem/perception.py perceive_kekule_aromaticity)
  std::set<std::pair<int, int>> arom_ring_bonds;
  for (auto& ring : rings) {
    std::set<int> rs(ring.begin(), ring.end());
    std::vector<int> bis;
    bool all_arom = true;
    for (int a : ring)
      for (int bi : mol.adj[a]) {
        const Bond& b = mol.bonds[bi];
        int o = mol.other(bi, a);
        if (o > a && rs.count(o) && b.in_ring) {
          bis.push_back(bi);
          all_arom &= b.order == AROMATIC;
        }
      }
    if (all_arom && !bis.empty())
      for (int bi : bis) arom_ring_bonds.insert({mol.bonds[bi].u, mol.bonds[bi].v});
  }
  for (auto& b : mol.bonds)
    if (b.order == AROMATIC && !arom_ring_bonds.count({b.u, b.v})) {
      b.order = SINGLE;
      b.aromatic = false;
    }
  for (auto& b : mol.bonds)
    if (b.order == AROMATIC) b.aromatic = true;
  // RDKit normalization (mirrors chem/perception.py): an explicitly-written
  // single bond (-, /, \) inside an aromatic ring is retyped AROMATIC —
  // only when the ring is an aromatic system in its own right: all atoms
  // aromatic, every other ring bond aromatic, and at least one atom
  // exclusive to this ring (biphenylene/triazolam fusion-only rings keep
  // their single linkers).
  std::map<int, int> ring_membership;
  for (auto& ring : rings)
    for (int a : ring) ring_membership[a]++;
  for (auto& ring : rings) {
    bool all_arom = true, has_excl = false;
    for (int a : ring) {
      all_arom &= mol.atoms[a].aromatic;
      has_excl |= ring_membership[a] == 1;
    }
    if (!all_arom || !has_excl) continue;
    std::set<int> rs(ring.begin(), ring.end());
    std::vector<int> singles;
    bool any_arom = false, only_arom_single = true;
    for (int a : ring)
      for (int bi : mol.adj[a]) {
        const Bond& b = mol.bonds[bi];
        int o = mol.other(bi, a);
        if (o > a && rs.count(o) && b.in_ring) {
          if (b.order == AROMATIC) any_arom = true;
          else if (b.order == SINGLE) singles.push_back(bi);
          else only_arom_single = false;
        }
      }
    if (any_arom && only_arom_single)
      for (int bi : singles) {
        mol.bonds[bi].order = AROMATIC;
        mol.bonds[bi].aromatic = true;
      }
  }
}

int lone_pairs(const Mol& mol, int a) {
  const Atom& at = mol.atoms[a];
  int ne = n_outer_electrons(at.z);
  if (ne == 0) return 0;
  int used = (int)std::lround(eff_order_sum(mol, a)) + mol.total_hs(a);
  int lp = (ne - at.charge - used) / 2;
  return lp > 0 ? lp : 0;
}

void perceive_conjugation(Mol& mol) {
  // RDKit MolOps::setConjugation / markConjAtomBonds (see
  // chem/perception.py perceive_conjugation): around every candidate atom
  // (B/C/N/O; P and S never conjugate - RDKit Issue211) with sigma framework
  // 2..3 carrying a multiple/aromatic bond, every other bond to a candidate
  // with sigma framework <= 3 is conjugated along with the multiple bond.
  auto cand = [&](int a) {
    int z = mol.atoms[a].z;
    return z == 5 || z == 6 || z == 7 || z == 8;
  };
  auto sbo = [&](int a) { return mol.degree(a) + mol.total_hs(a); };
  for (auto& b : mol.bonds) b.conjugated = b.order == AROMATIC;
  for (size_t a = 0; a < mol.atoms.size(); a++) {
    if (!cand((int)a)) continue;
    int s = sbo((int)a);
    if (s < 2 || s > 3) continue;
    std::vector<int> multi;
    for (int bi : mol.adj[a]) {
      int o = mol.bonds[bi].order;
      if (o == DOUBLE || o == TRIPLE || o == AROMATIC) multi.push_back(bi);
    }
    if (multi.empty()) continue;
    for (int bi2 : mol.adj[a]) {
      int j = mol.other(bi2, (int)a);
      if (!cand(j) || sbo(j) > 3) continue;
      for (int bi1 : multi)
        if (bi1 != bi2) {
          mol.bonds[bi1].conjugated = true;
          mol.bonds[bi2].conjugated = true;
        }
    }
  }
}

void perceive_hybridization(Mol& mol) {
  for (size_t a = 0; a < mol.atoms.size(); a++) {
    Atom& at = mol.atoms[a];
    if (at.aromatic) { at.hyb = H_SP2; continue; }
    int sigma = mol.degree((int)a) + mol.total_hs((int)a);
    int lp = lone_pairs(mol, (int)a);
    int steric = sigma + lp;
    bool has_multi = false, any_conj = false;
    for (int bi : mol.adj[a]) {
      int o = mol.bonds[bi].order;
      if (o == DOUBLE || o == TRIPLE || o == AROMATIC) has_multi = true;
      if (mol.bonds[bi].conjugated) any_conj = true;
    }
    if (lp > 0 && !has_multi && any_conj) steric -= 1;
    if (steric <= 0)
      at.hyb = (sigma + mol.total_hs((int)a)) > 0 ? H_S : H_UNSPEC;
    else if (steric <= 6)
      at.hyb = steric == 1 ? H_S : steric == 2 ? H_SP : steric == 3 ? H_SP2
               : steric == 4 ? H_SP3 : steric == 5 ? H_SP3D : H_SP3D2;
    else
      at.hyb = H_OTHER;
  }
}

// CIP rule-1a comparison of root's substituent branches x vs y: 1 if x
// outranks y, -1 if y outranks x, 0 on a tie within max_depth spheres.
// Mirrors chem/perception.py:_cip_branch_gt (hierarchical digraph with
// phantom duplicate atoms for multiple/aromatic bonds).
int cip_branch_cmp(const Mol& mol, int root, int x, int y, int max_depth = 8) {
  // frontier entry: atom >= 0 with parent, or phantom {-1 - z, 0}. Phantoms
  // (duplicate atoms of multiple bonds, INCLUDING back toward the parent)
  // count at the sphere where the duplicate sits — one past its origin —
  // and have no children (mirrors chem/perception.py:_cip_branch_gt).
  using Entry = std::pair<int, int>;
  std::vector<Entry> fx = {{x, root}}, fy = {{y, root}};
  auto level_key = [&](const std::vector<Entry>& frontier) {
    std::vector<int> vals;
    for (auto [u, p] : frontier)
      vals.push_back(u >= 0 ? mol.atoms[u].z : -1 - u);
    std::sort(vals.rbegin(), vals.rend());
    return vals;
  };
  auto expand = [&](const std::vector<Entry>& frontier) {
    std::vector<Entry> out;
    for (auto [u, p] : frontier) {
      if (u < 0) continue;  // phantom: no children
      for (int bi : mol.adj[u]) {
        int v = mol.other(bi, u);
        if (v != p) out.push_back({v, u});
        int o = mol.bonds[bi].order;
        int extra = (o == DOUBLE || o == AROMATIC) ? 1 : o == TRIPLE ? 2 : 0;
        for (int k = 0; k < extra; k++) out.push_back({-1 - mol.atoms[v].z, 0});
      }
    }
    return out;
  };
  for (int d = 0; d < max_depth; d++) {
    auto kx = level_key(fx), ky = level_key(fy);
    if (kx != ky) return kx > ky ? 1 : -1;
    fx = expand(fx); fy = expand(fy);
    if (fx.empty() && fy.empty()) return 0;
  }
  return 0;
}

// RDKit LEGACY CIP ranks (mirrors chem/perception.py:legacy_cip_ranks).
// The seed invariant packs ((z % 10000) << 10 | isotope-delta field) << 10
// | MAP-NUMBER field — so on a fully atom-mapped molecule every invariant
// is distinct, the refinement loop never runs, and the reproduction of
// RDKit's legacy assignStereochemistry ranking is exact by construction.
// Refinement (partially-mapped/unmapped inputs): per round, each atom
// appends its rank + the descending list of neighbor ranks+1 (each
// neighbor repeated at twice its bond order; implicit Hs as 0s), entries
// are -1-padded to equal length and re-ranked lexicographically until the
// classes stop splitting.
std::vector<int> legacy_cip_ranks(const Mol& mol) {
  int n = (int)mol.atoms.size();
  std::vector<long long> invars(n);
  for (int i = 0; i < n; i++) {
    const Atom& a = mol.atoms[i];
    long long num = a.z % 10000;
    long long mass = 0;
    if (a.isotope) {
      mass = a.isotope - (long long)std::llround(MASSES[a.z]);
      if (mass > 0) mass += 1;
    }
    mass += 512;
    if (mass < 0) mass = 0; else mass %= 1024;
    long long mapf = a.map_num ? ((a.map_num + 1) % 1024) : 0;
    invars[i] = ((num << 10) | mass) << 10 | mapf;
  }
  std::vector<long long> uniq(invars);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  std::vector<int> ranks(n);
  for (int i = 0; i < n; i++)
    ranks[i] = (int)(std::lower_bound(uniq.begin(), uniq.end(), invars[i]) - uniq.begin());
  int num_ranks = (int)uniq.size(), last = -1, its = 0;
  std::vector<std::vector<int>> entries(n);
  while (num_ranks < n && num_ranks != last && its < n) {
    size_t longest = 0;
    for (int i = 0; i < n; i++) {
      std::vector<int> local;
      for (int bi : mol.adj[i]) {
        int o = mol.bonds[bi].order;
        int twice = o == AROMATIC ? 3 : 2 * (o == QUAD ? 4 : o);
        int rr = ranks[mol.other(bi, i)] + 1;
        local.insert(local.end(), twice, rr);
      }
      local.insert(local.end(), mol.total_hs(i), 0);
      std::sort(local.rbegin(), local.rend());
      entries[i].push_back(ranks[i]);
      entries[i].insert(entries[i].end(), local.begin(), local.end());
      longest = std::max(longest, entries[i].size());
    }
    for (int i = 0; i < n; i++) entries[i].resize(longest, -1);
    last = num_ranks;
    std::vector<int> idx(n);
    for (int i = 0; i < n; i++) idx[i] = i;
    std::sort(idx.begin(), idx.end(),
              [&](int x, int y) { return entries[x] < entries[y]; });
    int r = 0;
    std::vector<int> nr(n);
    for (int k = 0; k < n; k++) {
      if (k && entries[idx[k]] != entries[idx[k - 1]]) r++;
      nr[idx[k]] = r;
    }
    ranks = nr;
    num_ranks = r + 1;
    its++;
  }
  return ranks;
}

void assign_stereo(Mol& mol) {
  // legacy ranks only when FULLY mapped: the no-refinement exactness
  // argument (map numbers break all ties) does not cover partial mapping
  // (mirrors chem/perception.py:assign_bond_stereo).
  bool mapped = !mol.atoms.empty();
  for (const Atom& a : mol.atoms)
    if (a.map_num <= 0) { mapped = false; break; }
  std::vector<int> lranks;
  if (mapped) lranks = legacy_cip_ranks(mol);
  for (size_t bidx = 0; bidx < mol.bonds.size(); bidx++) {
    Bond& b = mol.bonds[bidx];
    if (b.order != DOUBLE) continue;
    int refs[2] = {-1, -1}, signs[2] = {0, 0};
    bool have[2] = {false, false};
    for (int which = 0; which < 2; which++) {
      int end = which == 0 ? b.u : b.v;
      for (int nbi : mol.adj[end]) {
        Bond& nb = mol.bonds[nbi];
        if (&nb == &b || nb.dir == D_NONE) continue;
        int sign = nb.dir == D_UP ? 1 : -1;
        if (nb.u != end) sign = -sign;  // written far->end: invert
        refs[which] = mol.other(nbi, end);
        signs[which] = sign;
        have[which] = true;
        break;
      }
    }
    if (!have[0] || !have[1]) continue;
    // RDKit semantics: the Z/E label refers to the higher-CIP-priority
    // substituent on each end (mirrors chem/perception.py assign_bond_stereo)
    for (int which = 0; which < 2; which++) {
      int end = which == 0 ? b.u : b.v;
      for (int nbi : mol.adj[end]) {
        if (nbi == (int)bidx) continue;
        int o = mol.other(nbi, end);
        if (o == refs[which]) continue;
        // atom-mapped molecules: exact RDKit legacy ranks (map numbers
        // break ties); unmapped: rule-1a digraph comparison — mirrors
        // chem/perception.py:assign_bond_stereo
        bool outranked = mapped ? lranks[o] > lranks[refs[which]]
                                : cip_branch_cmp(mol, end, o, refs[which]) == 1;
        if (outranked) {
          refs[which] = o;
          signs[which] = -signs[which];
        }
        break;
      }
    }
    b.stereo = (signs[0] == signs[1]) ? S_Z : S_E;
  }
}

void remove_explicit_hs(Mol& mol, Mol& out) {
  std::vector<char> keep(mol.atoms.size(), 1);
  for (size_t a = 0; a < mol.atoms.size(); a++) {
    Atom& at = mol.atoms[a];
    if (at.z == 1 && at.isotope == 0 && at.charge == 0 && at.map_num == 0 &&
        mol.degree((int)a) == 1 && at.explicit_hs <= 0) {
      int bi = mol.adj[a][0];
      if (mol.bonds[bi].order != SINGLE) continue;
      int nbr = mol.other(bi, (int)a);
      if (mol.atoms[nbr].z == 1) continue;
      if (mol.atoms[nbr].explicit_hs >= 0) mol.atoms[nbr].explicit_hs += 1;
      keep[a] = 0;
    }
  }
  std::vector<int> remap(mol.atoms.size(), -1);
  for (size_t a = 0; a < mol.atoms.size(); a++)
    if (keep[a]) remap[a] = out.add_atom(mol.atoms[a]);
  for (auto& b : mol.bonds)
    if (keep[b.u] && keep[b.v]) {
      int bi = out.add_bond(remap[b.u], remap[b.v], b.order);
      out.bonds[bi].dir = b.dir;
      out.bonds[bi].implicit_arom = b.implicit_arom;
    }
}

Mol make_mol(const std::string& smi, bool keep_h) {
  Mol parsed = parse_smiles(smi);
  Mol mol;
  if (!keep_h) {
    remove_explicit_hs(parsed, mol);
  } else {
    mol = std::move(parsed);
  }
  cleanup_hypervalent(mol);
  auto rings = perceive_rings(mol);
  resolve_implicit_aromatic(mol);
  assign_implicit_h(mol);
  aromatize(mol, rings);
  perceive_conjugation(mol);
  perceive_hybridization(mol);
  assign_stereo(mol);
  return mol;
}

// ----------------------------------------------------------- featurization
// V2 layout (featurizers/atom.py): atomic num (37+1) | degree (6+1) |
// charge (5+1) | chiral (4+1) | numH (5+1) | hyb (7+1) | aromatic | 0.01*mass
const int V2_DIM = 72;
const int BOND_DIM = 14;

void featurize_atom_v2(const Mol& mol, int a, float* x) {
  std::memset(x, 0, sizeof(float) * V2_DIM);
  const Atom& at = mol.atoms[a];
  // atomic num: 1..36 -> 0..35, 53 -> 36, unknown -> 37
  int zi = (at.z >= 1 && at.z <= 36) ? at.z - 1 : at.z == 53 ? 36 : 37;
  x[zi] = 1;
  int off = 38;
  int deg = mol.total_degree(a);
  x[off + (deg >= 0 && deg <= 5 ? deg : 6)] = 1;
  off += 7;
  static const int charges[5] = {-1, -2, 1, 2, 0};
  int qi = 5;
  for (int k = 0; k < 5; k++)
    if (at.charge == charges[k]) { qi = k; break; }
  x[off + qi] = 1;
  off += 6;
  x[off + (at.chiral >= 0 && at.chiral <= 3 ? at.chiral : 4)] = 1;
  off += 5;
  int hs = mol.total_hs(a);
  x[off + (hs >= 0 && hs <= 4 ? hs : 5)] = 1;
  off += 6;
  // hybridizations [S, SP, SP2, SP2D, SP3, SP3D, SP3D2] (enum 1,2,3,5,4,6,7)
  static const int hybs[7] = {H_S, H_SP, H_SP2, H_SP2D, H_SP3, H_SP3D, H_SP3D2};
  int hi = 7;
  for (int k = 0; k < 7; k++)
    if (at.hyb == hybs[k]) { hi = k; break; }
  x[off + hi] = 1;
  off += 8;
  x[off] = at.aromatic ? 1.0f : 0.0f;
  double mass = at.isotope ? (double)at.isotope : MASSES[at.z];
  x[off + 1] = (float)(0.01 * mass);
}

void featurize_bond(const Mol& mol, int bi, float* x) {
  std::memset(x, 0, sizeof(float) * BOND_DIM);
  const Bond& b = mol.bonds[bi];
  int ti = -1;
  if (b.order == SINGLE) ti = 0;
  else if (b.order == DOUBLE) ti = 1;
  else if (b.order == TRIPLE) ti = 2;
  else if (b.order == AROMATIC) ti = 3;
  if (ti >= 0) x[1 + ti] = 1;
  x[5] = b.conjugated ? 1 : 0;
  x[6] = b.in_ring ? 1 : 0;
  int st = b.stereo >= 0 && b.stereo <= 5 ? b.stereo : 6;
  x[7 + st] = 1;
}

struct BatchResult {
  std::vector<float> V;         // [n_atoms, atom_fdim]
  std::vector<float> E;         // [n_edges, bond_fdim]
  std::vector<int32_t> src, dst, rev;
  std::vector<int32_t> batch;   // atom -> mol
  std::vector<int32_t> mol_atom_offsets;  // [n+1]
  std::vector<int32_t> mol_edge_offsets;  // [n+1]
  int atom_fdim = V2_DIM;
  int bond_fdim = BOND_DIM;
  std::string error;
  int error_index = -1;
};

BatchResult featurize_batch(const std::vector<std::string>& smiles, bool keep_h) {
  BatchResult r;
  r.mol_atom_offsets.push_back(0);
  r.mol_edge_offsets.push_back(0);
  int atom0 = 0, edge0 = 0;
  for (size_t m = 0; m < smiles.size(); m++) {
    Mol mol;
    try {
      mol = make_mol(smiles[m], keep_h);
    } catch (ParseError& e) {
      r.error = e.msg;
      r.error_index = (int)m;
      return r;
    }
    int na = (int)mol.atoms.size();
    if (na == 0) {
      // zero-atom mol: one zero feature row (reference molecule.py:65-66)
      r.V.resize(r.V.size() + V2_DIM, 0.0f);
      r.batch.push_back((int)m);
      atom0 += 1;
      r.mol_atom_offsets.push_back(atom0);
      r.mol_edge_offsets.push_back(edge0);
      continue;
    }
    size_t vbase = r.V.size();
    r.V.resize(vbase + (size_t)na * V2_DIM);
    for (int a = 0; a < na; a++) {
      featurize_atom_v2(mol, a, &r.V[vbase + (size_t)a * V2_DIM]);
      r.batch.push_back((int)m);
    }
    int nb = (int)mol.bonds.size();
    size_t ebase = r.E.size();
    r.E.resize(ebase + (size_t)2 * nb * BOND_DIM);
    float tmp[BOND_DIM];
    for (int bi = 0; bi < nb; bi++) {
      featurize_bond(mol, bi, tmp);
      std::memcpy(&r.E[ebase + (size_t)(2 * bi) * BOND_DIM], tmp, sizeof(tmp));
      std::memcpy(&r.E[ebase + (size_t)(2 * bi + 1) * BOND_DIM], tmp, sizeof(tmp));
      int u = mol.bonds[bi].u + atom0, v = mol.bonds[bi].v + atom0;
      r.src.push_back(u); r.dst.push_back(v);
      r.src.push_back(v); r.dst.push_back(u);
      r.rev.push_back(edge0 + 2 * bi + 1);
      r.rev.push_back(edge0 + 2 * bi);
    }
    atom0 += na;
    edge0 += 2 * nb;
    r.mol_atom_offsets.push_back(atom0);
    r.mol_edge_offsets.push_back(edge0);
  }
  return r;
}

// --------------------------------------------- CGR reaction featurization
// C++ port of the in-repo CGR featurizer (chemprop_tpu/featurizers/molgraph/
// reaction.py; reference chemprop/featurizers/molgraph/reaction.py:45-332):
// atom-map pairing of reactant/product, node features = reactant block ∥
// (product/diff block minus the atomic-number one-hot), edges enumerated
// over atom pairs bonded on either side. Modes 0..5 = {REAC_PROD, REAC_DIFF,
// PROD_DIFF} × {plain, _BALANCE}: kind = mode / 2, balanced = mode % 2.

const int K_ATOMIC = 38;  // atomic-number one-hot block width (36 + I + unk)
const int CGR_ATOM_DIM = 2 * V2_DIM - K_ATOMIC;  // 106
const int CGR_BOND_DIM = 2 * BOND_DIM;           // 28

void featurize_atom_num_only(const Mol& mol, int a, float* x) {
  // only the atomic-number bit (reaction.py num_only dummy atoms)
  std::memset(x, 0, sizeof(float) * V2_DIM);
  int z = mol.atoms[a].z;
  int zi = (z >= 1 && z <= 36) ? z - 1 : z == 53 ? 36 : 37;
  x[zi] = 1;
}

void featurize_bond_or_null(const Mol* mol, int bi, float* x) {
  if (mol == nullptr || bi < 0) {
    std::memset(x, 0, sizeof(float) * BOND_DIM);
    x[0] = 1;  // null-bond bit
    return;
  }
  featurize_bond(*mol, bi, x);
}

int bond_between(const Mol& mol, int u, int v) {
  if (u < 0 || v < 0) return -1;
  for (int bi : mol.adj[u])
    if (mol.other(bi, u) == v) return bi;
  return -1;
}

struct RxnMap {
  std::vector<int> r2p;       // reactant idx -> product idx, -1 if unmapped
  std::vector<int> pdt_only;  // product idxs with no reactant partner
};

RxnMap map_reac_to_prod(const Mol& rct, const Mol& pdt) {
  RxnMap m;
  std::set<int> rct_mapnos;
  for (auto& a : rct.atoms)
    if (a.map_num > 0) rct_mapnos.insert(a.map_num);
  std::map<int, int> mapno2pj;
  for (size_t j = 0; j < pdt.atoms.size(); j++) {
    int mn = pdt.atoms[j].map_num;
    if (mn > 0) {
      mapno2pj[mn] = (int)j;
      if (!rct_mapnos.count(mn)) m.pdt_only.push_back((int)j);
    } else {
      m.pdt_only.push_back((int)j);
    }
  }
  m.r2p.assign(rct.atoms.size(), -1);
  for (size_t i = 0; i < rct.atoms.size(); i++) {
    int mn = rct.atoms[i].map_num;
    auto it = mn > 0 ? mapno2pj.find(mn) : mapno2pj.end();
    if (it != mapno2pj.end()) m.r2p[i] = it->second;
  }
  return m;
}

BatchResult cgr_featurize_batch(const std::vector<std::string>& rxns, bool keep_h, int mode) {
  BatchResult r;
  r.atom_fdim = CGR_ATOM_DIM;
  r.bond_fdim = CGR_BOND_DIM;
  r.mol_atom_offsets.push_back(0);
  r.mol_edge_offsets.push_back(0);
  const int kind = mode / 2;      // 0 REAC_PROD, 1 REAC_DIFF, 2 PROD_DIFF
  const bool balanced = mode % 2; // *_BALANCE
  int atom0 = 0, edge0 = 0;
  float xr[V2_DIM], xp[V2_DIM], er[BOND_DIM], ep[BOND_DIM];
  for (size_t m = 0; m < rxns.size(); m++) {
    Mol rct, pdt;
    try {
      // split "rct>agents>pdt" (agents folded into reactants, matching
      // ReactionDatapoint.from_smi) or "rct>>pdt"
      const std::string& s = rxns[m];
      size_t p1 = s.find('>');
      size_t p2 = s.rfind('>');
      if (p1 == std::string::npos || p2 == p1) throw ParseError{"not a reaction SMILES"};
      std::string rct_smi = s.substr(0, p1);
      std::string agt = p2 > p1 + 1 ? s.substr(p1 + 1, p2 - p1 - 1) : "";
      if (!agt.empty()) rct_smi += "." + agt;
      rct = make_mol(rct_smi, keep_h);
      pdt = make_mol(s.substr(p2 + 1), keep_h);
    } catch (ParseError& e) {
      r.error = e.msg;
      r.error_index = (int)m;
      return r;
    }
    RxnMap map = map_reac_to_prod(rct, pdt);
    int n_rct = (int)rct.atoms.size();
    int n_tot = n_rct + (int)map.pdt_only.size();

    size_t vbase = r.V.size();
    r.V.resize(vbase + (size_t)n_tot * CGR_ATOM_DIM, 0.0f);
    for (int i = 0; i < n_tot; i++) {
      if (i < n_rct) {
        int pj = map.r2p[i];
        featurize_atom_v2(rct, i, xr);
        if (pj >= 0)
          featurize_atom_v2(pdt, pj, xp);
        else if (balanced)
          featurize_atom_v2(rct, i, xp);
        else
          featurize_atom_num_only(rct, i, xp);
      } else {
        int pj = map.pdt_only[i - n_rct];
        featurize_atom_v2(pdt, pj, xp);
        if (balanced)
          std::memcpy(xr, xp, sizeof(xr));
        else
          featurize_atom_num_only(pdt, pj, xr);
      }
      float* out = &r.V[vbase + (size_t)i * CGR_ATOM_DIM];
      const float* first = kind == 2 ? xp : xr;  // PROD_DIFF leads with product
      std::memcpy(out, first, sizeof(float) * V2_DIM);
      for (int k = K_ATOMIC; k < V2_DIM; k++)
        out[V2_DIM + k - K_ATOMIC] = kind == 0 ? xp[k] : xp[k] - xr[k];
      r.batch.push_back((int)m);
    }

    int ne = 0;
    for (int u = 0; u < n_tot; u++) {
      for (int v = u + 1; v < n_tot; v++) {
        // _get_bonds (reaction.py:166-187): which side has a bond for (u, v)
        const Mol *mr = nullptr, *mp = nullptr;
        int br = -1, bp = -1;
        if (u >= n_rct) {  // both product-only (u < v implies v >= n_rct too)
          bp = bond_between(pdt, map.pdt_only[u - n_rct], map.pdt_only[v - n_rct]);
          mp = &pdt;
          if (balanced) { br = bp; mr = &pdt; }
        } else if (v >= n_rct) {
          if (map.r2p[u] >= 0) {
            bp = bond_between(pdt, map.r2p[u], map.pdt_only[v - n_rct]);
            mp = &pdt;
          }
        } else {
          br = bond_between(rct, u, v);
          mr = &rct;
          if (map.r2p[u] >= 0 && map.r2p[v] >= 0) {
            bp = bond_between(pdt, map.r2p[u], map.r2p[v]);
            mp = &pdt;
          } else if (balanced && map.r2p[u] < 0 && map.r2p[v] < 0) {
            bp = br;
            mp = &rct;
          }
        }
        if (br < 0 && bp < 0) continue;
        featurize_bond_or_null(mr, br, er);
        featurize_bond_or_null(mp, bp, ep);
        float xe[CGR_BOND_DIM];
        const float* first = kind == 2 ? ep : er;
        std::memcpy(xe, first, sizeof(float) * BOND_DIM);
        for (int k = 0; k < BOND_DIM; k++)
          xe[BOND_DIM + k] = kind == 0 ? ep[k] : ep[k] - er[k];
        r.E.insert(r.E.end(), xe, xe + CGR_BOND_DIM);
        r.E.insert(r.E.end(), xe, xe + CGR_BOND_DIM);
        r.src.push_back(atom0 + u); r.dst.push_back(atom0 + v);
        r.src.push_back(atom0 + v); r.dst.push_back(atom0 + u);
        r.rev.push_back(edge0 + ne + 1);
        r.rev.push_back(edge0 + ne);
        ne += 2;
      }
    }
    atom0 += n_tot;
    edge0 += ne;
    r.mol_atom_offsets.push_back(atom0);
    r.mol_edge_offsets.push_back(edge0);
  }
  return r;
}

}  // namespace

// ------------------------------------------------------------------- C API
extern "C" {

void* cptpu_featurize_batch(const char** smiles, int n, int keep_h) {
  std::vector<std::string> v(smiles, smiles + n);
  auto* res = new BatchResult(featurize_batch(v, keep_h != 0));
  return res;
}

void* cptpu_featurize_rxn_batch(const char** rxns, int n, int keep_h, int mode) {
  std::vector<std::string> v(rxns, rxns + n);
  auto* res = new BatchResult(cgr_featurize_batch(v, keep_h != 0, mode));
  return res;
}

int cptpu_error_index(void* h) { return ((BatchResult*)h)->error_index; }
const char* cptpu_error_msg(void* h) { return ((BatchResult*)h)->error.c_str(); }
int64_t cptpu_n_atoms(void* h) { return (int64_t)((BatchResult*)h)->batch.size(); }
int64_t cptpu_n_edges(void* h) { return (int64_t)((BatchResult*)h)->src.size(); }
int cptpu_atom_fdim(void* h) { return ((BatchResult*)h)->atom_fdim; }
int cptpu_bond_fdim(void* h) { return ((BatchResult*)h)->bond_fdim; }
const float* cptpu_V(void* h) { return ((BatchResult*)h)->V.data(); }
const float* cptpu_E(void* h) { return ((BatchResult*)h)->E.data(); }
const int32_t* cptpu_src(void* h) { return ((BatchResult*)h)->src.data(); }
const int32_t* cptpu_dst(void* h) { return ((BatchResult*)h)->dst.data(); }
const int32_t* cptpu_rev(void* h) { return ((BatchResult*)h)->rev.data(); }
const int32_t* cptpu_batch(void* h) { return ((BatchResult*)h)->batch.data(); }
const int32_t* cptpu_atom_offsets(void* h) {
  return ((BatchResult*)h)->mol_atom_offsets.data();
}
const int32_t* cptpu_edge_offsets(void* h) {
  return ((BatchResult*)h)->mol_edge_offsets.data();
}
void cptpu_free(void* h) { delete (BatchResult*)h; }

}  // extern "C"
