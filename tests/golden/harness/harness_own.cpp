// Golden-fixture generator for the own-dBG path: compiles the reference
// kernels from /root/reference/lib/DeNovoAssembler.cpp verbatim (via
// #include, with Rcpp/gtl/edlib supplied by the shim headers in this
// directory) and drives get_contigs -> assemble_contigs -> calc_breakscore
// on a harness input file. Usage: harness_own <input> > fixture.json
#include "harness_io.h"

#include REFERENCE_TU  // /root/reference/lib/DeNovoAssembler.cpp

#include <algorithm>

int main(int argc, char **argv) {
  if (argc != 2) {
    std::cerr << "usage: harness_own <input>\n";
    return 1;
  }
  HarnessInput h = read_input(argv[1]);

  auto contig_matrix = get_contigs(h.items, h.dbg_kmer, h.seed);
  auto solutions = assemble_contigs(contig_matrix, h.dbg_kmer);
  Rcpp::List scores = calc_breakscore(solutions, h.reads, h.true_solution,
                                      h.kmer, h.bp_kmer, h.bp_prob);

  // canonical contig set = any ordering, sorted (orderings are permutations
  // of the sort+deduped set, DeNovoAssembler.cpp:192-205)
  std::vector<std::string> contig_set = contig_matrix.empty()
                                            ? std::vector<std::string>{}
                                            : contig_matrix[0];
  std::sort(contig_set.begin(), contig_set.end());

  std::ostream &o = std::cout;
  o << "{\"n_orderings\":" << contig_matrix.size();
  o << ",\"contigs\":";
  json_arr(o, contig_set);
  // first two shuffled orderings: gates the mt19937/std::shuffle replay
  o << ",\"ordering0\":";
  json_arr(o, contig_matrix.empty() ? std::vector<std::string>{}
                                    : contig_matrix[0]);
  o << ",\"ordering1\":";
  json_arr(o, contig_matrix.size() > 1 ? contig_matrix[1]
                                       : std::vector<std::string>{});
  o << ",\"solutions\":";
  json_arr(o, solutions);
  // path_freq rows are emitted in gtl hash-map order by the reference and
  // only ever feed an order-invariant KS test; dump the order-free content:
  // sorted nonzero finite values per row (zeros and the all-NaN no-match
  // case are reconstructible from kmer_breaks and the table size).
  dump_list(o, scores, "path_freq");
  const auto &pf =
      scores.get<std::vector<std::vector<double>>>("path_freq");
  std::vector<std::vector<double>> nz(pf.size());
  for (size_t i = 0; i < pf.size(); ++i) {
    for (double v : pf[i]) {
      if (v == v && v != 0.0) nz[i].push_back(v);
    }
    std::sort(nz[i].begin(), nz[i].end());
  }
  o << ",\"path_freq_nonzero_sorted\":";
  json_arr(o, nz);
  o << ",\"path_freq_width\":" << (pf.empty() ? 0 : (int)pf[0].size());
  o << "}\n";
  return 0;
}
