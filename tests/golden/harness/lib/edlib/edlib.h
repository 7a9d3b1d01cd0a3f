// edlib API stand-in for golden-fixture generation, implementing the exact
// subset the reference calls (DeNovoAssembler.cpp:41-55 NW,
// BreakageScorer.cpp:41-55 HW; distance task, unbounded k) with a plain
// O(nm) two-row DP. Edit distances are exact, so fixtures carry true
// lev_dist_vs_true values; only speed differs from real edlib.
#pragma once

#include <algorithm>
#include <cstdlib>
#include <vector>

#define EDLIB_STATUS_OK 0

typedef enum { EDLIB_MODE_NW, EDLIB_MODE_SHW, EDLIB_MODE_HW } EdlibAlignMode;
typedef enum {
  EDLIB_TASK_DISTANCE,
  EDLIB_TASK_LOC,
  EDLIB_TASK_PATH
} EdlibAlignTask;

typedef struct {
  char first;
  char second;
} EdlibEqualityPair;

typedef struct {
  int k;
  EdlibAlignMode mode;
  EdlibAlignTask task;
  const EdlibEqualityPair *additionalEqualities;
  int additionalEqualitiesLength;
} EdlibAlignConfig;

static inline EdlibAlignConfig edlibNewAlignConfig(
    int k, EdlibAlignMode mode, EdlibAlignTask task,
    const EdlibEqualityPair *additionalEqualities,
    int additionalEqualitiesLength) {
  EdlibAlignConfig cfg;
  cfg.k = k;
  cfg.mode = mode;
  cfg.task = task;
  cfg.additionalEqualities = additionalEqualities;
  cfg.additionalEqualitiesLength = additionalEqualitiesLength;
  return cfg;
}

typedef struct {
  int status;
  int editDistance;
  int *endLocations;
  int *startLocations;
  int numLocations;
  unsigned char *alignment;
  int alignmentLength;
  int alphabetLength;
} EdlibAlignResult;

// Levenshtein DP over (query rows x target cols).
//   NW: global — row 0 = j, answer = dp[qlen][tlen].
//   HW: query vs any infix of target — row 0 = 0, answer = min over last row.
static inline EdlibAlignResult edlibAlign(const char *query, int qlen,
                                          const char *target, int tlen,
                                          EdlibAlignConfig cfg) {
  std::vector<int> prev(tlen + 1), cur(tlen + 1);
  const bool infix = (cfg.mode == EDLIB_MODE_HW);
  for (int j = 0; j <= tlen; ++j) prev[j] = infix ? 0 : j;
  for (int i = 1; i <= qlen; ++i) {
    cur[0] = i;
    const char qc = query[i - 1];
    for (int j = 1; j <= tlen; ++j) {
      const int sub = prev[j - 1] + (qc != target[j - 1] ? 1 : 0);
      cur[j] = std::min(sub, std::min(prev[j], cur[j - 1]) + 1);
    }
    std::swap(prev, cur);
  }
  int dist = prev[tlen];
  if (infix) {
    for (int j = 0; j <= tlen; ++j) dist = std::min(dist, prev[j]);
  }
  EdlibAlignResult res;
  res.status = EDLIB_STATUS_OK;
  res.editDistance = dist;
  res.endLocations = nullptr;
  res.startLocations = nullptr;
  res.numLocations = 0;
  res.alignment = nullptr;
  res.alignmentLength = 0;
  res.alphabetLength = 4;
  return res;
}

static inline void edlibFreeAlignResult(EdlibAlignResult) {}
