// Golden-fixture generator for the velvet path: compiles the reference
// kernels from /root/reference/lib/BreakageScorer.cpp verbatim and drives
// assemble_contigs (20,000 internal orderings) -> calc_breakscore on a
// harness input file whose `items` are externally-assembled contigs.
// Usage: harness_velvet <input> > fixture.json
#include "harness_io.h"

#include REFERENCE_TU  // /root/reference/lib/BreakageScorer.cpp

int main(int argc, char **argv) {
  if (argc != 2) {
    std::cerr << "usage: harness_velvet <input>\n";
    return 1;
  }
  HarnessInput h = read_input(argv[1]);

  auto solutions = assemble_contigs(h.items, h.dbg_kmer, h.seed);
  Rcpp::List scores = calc_breakscore(solutions, h.reads, h.true_solution,
                                      h.kmer, h.bp_kmer, h.bp_prob);

  std::ostream &o = std::cout;
  o << "{\"solutions\":";
  json_arr(o, solutions);
  dump_list(o, scores);
  o << "}\n";
  return 0;
}
