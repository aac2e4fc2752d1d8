// tinman_timing — native named-region wall timers (GPTL equivalent).
//
// TPU-native re-design of the profiling layer the reference vendors as GPTL
// (/root/reference/compute_and_apply_rhs_test/cxx/level_vectorized_ppscan/
// gptl/gptl.h:117-151: GPTLinitialize/GPTLstart/GPTLstop/GPTLpr_summary_file):
// named nested region timers with per-thread tables, call counts, min/max/
// total wall time, parent-indented summary output. Exposed as a C ABI for
// ctypes (tinman_sandbox_tpu/profiling.py).
//
// Build: g++ -O2 -shared -fPIC -o libtinman_timing.so tinman_timing.cpp

#include <chrono>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

struct Region {
  long long calls = 0;
  double total = 0.0;
  double min = 1e300;
  double max = 0.0;
  int depth = 0;  // nesting depth at first start (for indented output)
};

struct ThreadTable {
  std::map<std::string, Region> regions;
  std::vector<std::pair<std::string, Clock::time_point>> stack;
  // preserve first-start order for readable summaries
  std::vector<std::string> order;
};

std::mutex g_mutex;
std::vector<ThreadTable*> g_tables;
bool g_initialized = false;

thread_local ThreadTable* t_table = nullptr;

ThreadTable& table() {
  if (!t_table) {
    t_table = new ThreadTable();
    std::lock_guard<std::mutex> lk(g_mutex);
    g_tables.push_back(t_table);
  }
  return *t_table;
}

}  // namespace

extern "C" {

int tt_initialize() {
  std::lock_guard<std::mutex> lk(g_mutex);
  g_initialized = true;
  return 0;
}

int tt_start(const char* name) {
  ThreadTable& t = table();
  t.stack.emplace_back(name, Clock::now());
  return 0;
}

int tt_stop(const char* name) {
  ThreadTable& t = table();
  if (t.stack.empty() || t.stack.back().first != name) return 1;  // mismatch
  const auto now = Clock::now();
  const double dt =
      std::chrono::duration<double>(now - t.stack.back().second).count();
  const int depth = static_cast<int>(t.stack.size()) - 1;
  t.stack.pop_back();
  auto it = t.regions.find(name);
  if (it == t.regions.end()) {
    it = t.regions.emplace(name, Region{}).first;
    it->second.depth = depth;
    t.order.push_back(name);
  }
  Region& r = it->second;
  r.calls += 1;
  r.total += dt;
  if (dt < r.min) r.min = dt;
  if (dt > r.max) r.max = dt;
  return 0;
}

// Fetch one region's stats into out[4] = {calls, total, min, max}.
// Returns 0 if found in any thread table (stats summed across threads).
int tt_get(const char* name, double* out) {
  std::lock_guard<std::mutex> lk(g_mutex);
  long long calls = 0;
  double total = 0, mn = 1e300, mx = 0;
  bool found = false;
  for (const ThreadTable* t : g_tables) {
    auto it = t->regions.find(name);
    if (it == t->regions.end()) continue;
    found = true;
    calls += it->second.calls;
    total += it->second.total;
    if (it->second.min < mn) mn = it->second.min;
    if (it->second.max > mx) mx = it->second.max;
  }
  if (!found) return 1;
  out[0] = static_cast<double>(calls);
  out[1] = total;
  out[2] = mn;
  out[3] = mx;
  return 0;
}

int tt_pr_summary_file(const char* path) {
  std::lock_guard<std::mutex> lk(g_mutex);
  FILE* f = std::fopen(path, "w");
  if (!f) return 1;
  std::fprintf(f, "%-40s %10s %14s %12s %12s\n", "region", "calls",
               "total_s", "min_s", "max_s");
  int tid = 0;
  for (const ThreadTable* t : g_tables) {
    if (g_tables.size() > 1) std::fprintf(f, "-- thread %d --\n", tid++);
    for (const std::string& name : t->order) {
      const Region& r = t->regions.at(name);
      std::string label(2 * r.depth, ' ');
      label += name;
      std::fprintf(f, "%-40s %10lld %14.6f %12.6f %12.6f\n", label.c_str(),
                   r.calls, r.total, r.min, r.max);
    }
  }
  std::fclose(f);
  return 0;
}

int tt_reset() {
  std::lock_guard<std::mutex> lk(g_mutex);
  for (ThreadTable* t : g_tables) {
    t->regions.clear();
    t->stack.clear();
    t->order.clear();
  }
  return 0;
}

}  // extern "C"
