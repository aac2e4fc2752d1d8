// tinman_timing — native named-region timers (GPTL equivalent).
//
// TPU-native re-design of the profiling layer the reference vendors as GPTL
// (/root/reference/compute_and_apply_rhs_test/cxx/level_vectorized_ppscan/
// gptl/gptl.h:117-151: GPTLinitialize/GPTLstart/GPTLstop/GPTLpr_summary_file,
// gptl.c wallclock/usr/sys stats and parent-tree report): named nested
// region timers with per-thread tables, call counts, wall min/max/total,
// per-thread usr/sys CPU time (getrusage(RUSAGE_THREAD), as GPTL's
// get_cpustamp does via times()), exclusive "self" wall time, and TRUE
// parent-child attribution — regions are keyed by their full call path, so
// the same name under two parents reports separately, indented under each
// parent, exactly like GPTL's tree output. Exposed as a C ABI for ctypes
// (tinman_sandbox_tpu/profiling.py).
//
// Build: g++ -O2 -shared -fPIC -o libtinman_timing.so tinman_timing.cpp

#include <sys/resource.h>

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
  double total = 0.0;   // inclusive wall
  double child = 0.0;   // wall spent in nested regions (self = total - child)
  double min = 1e300;
  double max = 0.0;
  double usr = 0.0;     // user CPU seconds (this thread)
  double sys = 0.0;     // system CPU seconds (this thread)
  int depth = 0;        // nesting depth at first start (for indented output)
};

struct Frame {
  std::string path;     // full "parent/.../name" key
  Clock::time_point wall;
  double usr, sys;
};

struct ThreadTable {
  std::map<std::string, Region> regions;  // keyed by full path
  std::vector<Frame> stack;
  std::vector<std::string> order;         // first-start order of paths
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

void cpu_now(double* usr, double* sys) {
  struct rusage ru;
#ifdef RUSAGE_THREAD
  getrusage(RUSAGE_THREAD, &ru);
#else
  getrusage(RUSAGE_SELF, &ru);
#endif
  *usr = ru.ru_utime.tv_sec + ru.ru_utime.tv_usec * 1e-6;
  *sys = ru.ru_stime.tv_sec + ru.ru_stime.tv_usec * 1e-6;
}

const char* leaf_of(const std::string& path) {
  const auto pos = path.rfind('/');
  return pos == std::string::npos ? path.c_str() : path.c_str() + pos + 1;
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
  Frame f;
  f.path = t.stack.empty() ? std::string(name)
                           : t.stack.back().path + "/" + name;
  // create the region at first START so parents precede children in the
  // first-start summary order (GPTL tree order)
  auto it = t.regions.find(f.path);
  if (it == t.regions.end()) {
    it = t.regions.emplace(f.path, Region{}).first;
    it->second.depth = static_cast<int>(t.stack.size());
    t.order.push_back(f.path);
  }
  f.wall = Clock::now();
  cpu_now(&f.usr, &f.sys);
  t.stack.push_back(std::move(f));
  return 0;
}

int tt_stop(const char* name) {
  ThreadTable& t = table();
  if (t.stack.empty() ||
      std::strcmp(leaf_of(t.stack.back().path), name) != 0)
    return 1;  // mismatched stop
  const auto now = Clock::now();
  double usr1, sys1;
  cpu_now(&usr1, &sys1);
  const Frame& f = t.stack.back();
  const double dt = std::chrono::duration<double>(now - f.wall).count();
  const double du = usr1 - f.usr, ds = sys1 - f.sys;
  const std::string path = f.path;
  const int depth = static_cast<int>(t.stack.size()) - 1;
  t.stack.pop_back();

  Region& r = t.regions.at(path);
  (void)depth;
  r.calls += 1;
  r.total += dt;
  r.usr += du;
  r.sys += ds;
  if (dt < r.min) r.min = dt;
  if (dt > r.max) r.max = dt;
  // parent attribution: the enclosing frame's region accumulates child wall
  if (!t.stack.empty()) t.regions.at(t.stack.back().path).child += dt;
  return 0;
}

// Fetch one region's stats into out[6] = {calls, total, min, max, usr, sys}.
// ``name`` matches any call path whose leaf equals it (summed across
// parents and threads), so existing callers keep working.
int tt_get(const char* name, double* out) {
  std::lock_guard<std::mutex> lk(g_mutex);
  long long calls = 0;
  double total = 0, mn = 1e300, mx = 0, usr = 0, sys = 0;
  bool found = false;
  for (const ThreadTable* t : g_tables) {
    for (const auto& kv : t->regions) {
      if (std::strcmp(leaf_of(kv.first), name) != 0) continue;
      found = true;
      calls += kv.second.calls;
      total += kv.second.total;
      usr += kv.second.usr;
      sys += kv.second.sys;
      if (kv.second.min < mn) mn = kv.second.min;
      if (kv.second.max > mx) mx = kv.second.max;
    }
  }
  if (!found) return 1;
  out[0] = static_cast<double>(calls);
  out[1] = total;
  out[2] = mn;
  out[3] = mx;
  out[4] = usr;
  out[5] = sys;
  return 0;
}

int tt_pr_summary_file(const char* path) {
  std::lock_guard<std::mutex> lk(g_mutex);
  FILE* f = std::fopen(path, "w");
  if (!f) return 1;
  std::fprintf(f, "%-40s %10s %12s %12s %10s %10s %12s %12s\n", "region",
               "calls", "total_s", "self_s", "usr_s", "sys_s", "min_s",
               "max_s");
  int tid = 0;
  for (const ThreadTable* t : g_tables) {
    if (g_tables.size() > 1) std::fprintf(f, "-- thread %d --\n", tid++);
    for (const std::string& key : t->order) {
      const Region& r = t->regions.at(key);
      std::string label(2 * r.depth, ' ');
      label += leaf_of(key);
      std::fprintf(f, "%-40s %10lld %12.6f %12.6f %10.4f %10.4f %12.6f %12.6f\n",
                   label.c_str(), r.calls, r.total, r.total - r.child, r.usr,
                   r.sys, r.min, r.max);
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
