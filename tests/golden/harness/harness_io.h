// Shared I/O for the golden-fixture harness binaries. Input is a plain
// line-based file (written by tests/golden/make_fixtures.py); output is JSON
// on stdout with doubles at full %.17g precision.
#pragma once

#include <cstdio>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <Rcpp.h>

struct HarnessInput {
  int dbg_kmer = 0;
  int seed = 0;
  int kmer = 0;
  std::string true_solution;
  std::vector<std::string> reads;
  std::vector<std::string> items;  // read k-mers (own) or contigs (velvet)
  std::vector<std::string> bp_kmer;
  std::vector<double> bp_prob;
};

inline HarnessInput read_input(const char *path) {
  std::ifstream in(path);
  if (!in) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(1);
  }
  HarnessInput h;
  std::string line;
  in >> h.dbg_kmer >> h.seed >> h.kmer;
  in >> h.true_solution;
  size_t n;
  in >> n;
  h.reads.resize(n);
  for (auto &r : h.reads) in >> r;
  in >> n;
  h.items.resize(n);
  for (auto &s : h.items) in >> s;
  in >> n;
  h.bp_kmer.resize(n);
  h.bp_prob.resize(n);
  for (size_t i = 0; i < n; ++i) in >> h.bp_kmer[i] >> h.bp_prob[i];
  if (!in) {
    std::cerr << "truncated input " << path << "\n";
    std::exit(1);
  }
  return h;
}

inline void json_str(std::ostream &o, const std::string &s) {
  o << '"' << s << '"';  // DNA strings only: no escaping needed
}

inline void json_arr(std::ostream &o, const std::vector<std::string> &v) {
  o << '[';
  for (size_t i = 0; i < v.size(); ++i) {
    if (i) o << ',';
    json_str(o, v[i]);
  }
  o << ']';
}

inline void json_arr(std::ostream &o, const std::vector<int> &v) {
  o << '[';
  for (size_t i = 0; i < v.size(); ++i) {
    if (i) o << ',';
    o << v[i];
  }
  o << ']';
}

inline void json_arr(std::ostream &o, const std::vector<double> &v) {
  char buf[64];
  o << '[';
  for (size_t i = 0; i < v.size(); ++i) {
    if (i) o << ',';
    if (v[i] != v[i]) {
      o << "NaN";  // json.loads accepts the NaN literal
    } else {
      std::snprintf(buf, sizeof buf, "%.17g", v[i]);
      o << buf;
    }
  }
  o << ']';
}

inline void json_arr(std::ostream &o,
                     const std::vector<std::vector<double>> &v) {
  o << '[';
  for (size_t i = 0; i < v.size(); ++i) {
    if (i) o << ',';
    json_arr(o, v[i]);
  }
  o << ']';
}

inline void dump_list(std::ostream &o, const Rcpp::List &l,
                      const std::string &skip = "") {
  for (const auto &item : l.items) {
    if (item.name == skip) continue;
    o << ',';
    json_str(o, item.name);
    o << ':';
    std::visit([&o](const auto &v) { json_arr(o, v); }, item.value);
  }
}
