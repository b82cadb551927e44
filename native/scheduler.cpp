// Native work scheduler for deepfactors_tpu.
//
// C++ implementation of the coarse-to-fine factor work scheduler — the
// runtime component the reference implements natively in
// sources/core/mapping/{work,work_manager,df_work}.{h,cpp}. Semantics
// reproduced exactly:
//   - per-work iteration budgets per pyramid level, active level starts at
//     the coarsest (df_work.cpp:99-115)
//   - Update(): decrement current level budget, descend when exhausted
//     (df_work.cpp:144-155)
//   - SignalNoRelinearize(): descend one level unless the work has not yet
//     constructed factors (df_work.cpp:164-169)
//   - Bookkeeping(): on first run or new-level start, (re)write the work's
//     factor-pool entry; on removal, free the slot (df_work.cpp:117-136)
//   - remove_after works are erased when their schedule completes; child
//     works are promoted when the parent finishes (work.h:38-77)
//
// Exposed as a dependency-free C ABI consumed from Python via ctypes
// (deepfactors_tpu/native.py). The factor pool lives here; Python mirrors
// it into device arrays after each bookkeeping pass.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kMaxLevels = 8;

enum WorkKind : int32_t { PHOTO = 0, REP = 1, GEO = 2 };

struct Work {
  int64_t id;
  WorkKind kind;
  int32_t src, dst;
  bool dst_is_frame;
  int32_t iters[kMaxLevels];
  int32_t orig_iters[kMaxLevels];
  int32_t n_levels;
  int32_t active_level;
  bool first;
  bool remove;
  bool remove_after;
  int32_t pool_slot;  // -1 = none
  int64_t child;      // work id of pending child, -1 = none
  bool child_pending;
};

struct Pool {
  std::vector<int32_t> src, dst, level;
  std::vector<uint8_t> is_frame, active;
  explicit Pool(int cap)
      : src(cap, 0), dst(cap, 0), level(cap, 0), is_frame(cap, 0),
        active(cap, 0) {}
  int alloc() {
    for (size_t i = 0; i < active.size(); ++i)
      if (!active[i]) return static_cast<int>(i);
    return -1;
  }
};

struct Scheduler {
  std::vector<Work> work;
  std::vector<Work> pending_children;
  Pool photo_pool;
  Pool rep_pool;
  Pool geo_pool;
  int64_t next_id = 1;
  int32_t error = 0;  // 1 = pool exhausted

  Scheduler(int photo_cap, int rep_cap, int geo_cap)
      : photo_pool(photo_cap), rep_pool(rep_cap), geo_pool(geo_cap) {}

  Pool& pool_for(WorkKind k) {
    switch (k) {
      case REP: return rep_pool;
      case GEO: return geo_pool;
      default: return photo_pool;
    }
  }
};

Work* find(Scheduler* s, int64_t id) {
  for (auto& w : s->work)
    if (w.id == id) return &w;
  for (auto& w : s->pending_children)
    if (w.id == id) return &w;
  return nullptr;
}

}  // namespace

extern "C" {

void* df_sched_new(int photo_cap, int rep_cap, int geo_cap) {
  return new Scheduler(photo_cap, rep_cap, geo_cap);
}

void df_sched_free(void* h) { delete static_cast<Scheduler*>(h); }

// Returns the new work id. iters is finest-first like the reference's
// IterList; active level starts at n_iters-1 (coarsest).
int64_t df_sched_add_work(void* h, int32_t kind, int32_t src, int32_t dst,
                          int32_t dst_is_frame, const int32_t* iters,
                          int32_t n_iters, int32_t remove_after,
                          int64_t parent_id) {
  auto* s = static_cast<Scheduler*>(h);
  if (n_iters <= 0 || n_iters > kMaxLevels) return -1;
  Work w{};
  w.id = s->next_id++;
  w.kind = static_cast<WorkKind>(kind);
  w.src = src;
  w.dst = dst;
  w.dst_is_frame = dst_is_frame != 0;
  std::memcpy(w.iters, iters, n_iters * sizeof(int32_t));
  std::memcpy(w.orig_iters, iters, n_iters * sizeof(int32_t));
  w.n_levels = n_iters;
  w.active_level = n_iters - 1;
  w.first = true;
  w.remove = false;
  w.remove_after = remove_after != 0;
  w.pool_slot = -1;
  w.child = -1;
  w.child_pending = false;
  if (parent_id > 0) {
    Work* p = find(s, parent_id);
    if (p) {
      p->child = w.id;
      s->pending_children.push_back(w);
      return w.id;
    }
  }
  s->work.push_back(w);
  return w.id;
}

// Deactivate any pool factor + work matching (src, dst, kind, !frame) —
// used to replace factors when a pair is re-enqueued (bounded pool).
void df_sched_replace_pair(void* h, int32_t kind, int32_t src, int32_t dst) {
  auto* s = static_cast<Scheduler*>(h);
  auto k = static_cast<WorkKind>(kind);
  Pool& p = s->pool_for(k);
  for (size_t i = 0; i < p.active.size(); ++i)
    if (p.active[i] && !p.is_frame[i] && p.src[i] == src && p.dst[i] == dst)
      p.active[i] = 0;
  for (auto it = s->work.begin(); it != s->work.end();)
    if (it->kind == k && !it->dst_is_frame && it->src == src &&
        it->dst == dst)
      it = s->work.erase(it);
    else
      ++it;
}

// Bookkeeping pass (df_work.cpp:117-136 semantics for every live work).
void df_sched_bookkeeping(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  for (auto& w : s->work) {
    Pool& p = s->pool_for(w.kind);
    if (w.remove) {
      if (w.pool_slot >= 0) {
        p.active[w.pool_slot] = 0;
        w.pool_slot = -1;
      }
      w.active_level = -2;
      continue;
    }
    bool new_level_start =
        w.active_level >= 0 &&
        w.iters[w.active_level] == w.orig_iters[w.active_level];
    if (w.first || (w.active_level >= 0 && new_level_start)) {
      w.first = false;
      if (w.pool_slot < 0) {
        w.pool_slot = p.alloc();
        if (w.pool_slot < 0) {
          s->error = 1;
          continue;
        }
      }
      p.src[w.pool_slot] = w.src;
      p.dst[w.pool_slot] = w.dst;
      p.is_frame[w.pool_slot] = w.dst_is_frame ? 1 : 0;
      p.level[w.pool_slot] = w.active_level > 0 ? w.active_level : 0;
      p.active[w.pool_slot] = 1;
    }
  }
}

// Iterations until the next schedule boundary: min over works of
// iters[level]+1 (>= 1).
int32_t df_sched_budget(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  int32_t budget = 0;
  for (auto& w : s->work) {
    if (w.active_level < 0) continue;
    int32_t b = w.iters[w.active_level] + 1;
    if (budget == 0 || b < budget) budget = b;
  }
  return budget > 0 ? budget : 1;
}

// Apply iters_done Update() ticks + optional no-relinearize signal, then
// sweep finished works (promoting children). Returns number of live works.
int32_t df_sched_update(void* h, int32_t iters_done, int32_t converged) {
  auto* s = static_cast<Scheduler*>(h);
  for (int t = 0; t < iters_done; ++t) {
    for (auto& w : s->work) {
      if (w.active_level >= 0 && --w.iters[w.active_level] < 0)
        w.active_level -= 1;
      if (w.remove_after && w.active_level < 0) w.remove = true;
    }
  }
  if (converged) {
    // guard at >= 0: mirrors PyScheduler — an unbounded decrement walks
    // already-finished works to arbitrarily negative levels
    for (auto& w : s->work)
      if (!w.first && w.active_level >= 0) w.active_level -= 1;
    for (auto& w : s->work)
      if (w.remove_after && w.active_level < 0) w.remove = true;
  }
  // sweep finished (Finished(): remove_after -> level==-2 else level==-1)
  std::vector<int64_t> promote;
  for (auto it = s->work.begin(); it != s->work.end();) {
    bool fin = it->remove_after ? (it->active_level <= -2 && it->pool_slot < 0)
                                : it->active_level <= -1;
    // remove_after works must pass one bookkeeping with remove=true first
    if (it->remove_after && it->active_level < 0 && it->pool_slot >= 0) {
      ++it;
      continue;
    }
    if (fin) {
      if (it->child > 0) promote.push_back(it->child);
      it = s->work.erase(it);
    } else {
      ++it;
    }
  }
  for (int64_t cid : promote) {
    for (auto it = s->pending_children.begin();
         it != s->pending_children.end(); ++it) {
      if (it->id == cid) {
        s->work.push_back(*it);
        s->pending_children.erase(it);
        break;
      }
    }
  }
  return static_cast<int32_t>(s->work.size());
}

int32_t df_sched_has_work(void* h) {
  return static_cast<Scheduler*>(h)->work.empty() ? 0 : 1;
}

// Shared-schedule signature for the mapper's single-dispatch C2F descent
// fast path (mapper._fused_segments): when every live work is a PHOTO work
// with no pending child, not flagged for removal, and ALL share one
// (active_level, iters, orig_iters) state, writes
//   out[0] = active_level, out[1] = n_levels,
//   out[2 .. 2+n)            = iters (finest-first),
//   out[2+kMaxLevels .. +n)  = orig_iters
// and returns 1; else returns 0 (caller falls back to phase-wise steps).
// out must hold 2 + 2*kMaxLevels ints.
int32_t df_sched_fused_sig(void* h, int32_t* out) {
  auto* s = static_cast<Scheduler*>(h);
  if (s->work.empty() || !s->pending_children.empty()) return 0;
  const Work* w0 = nullptr;
  for (auto& w : s->work) {
    if (w.remove || w.child > 0) return 0;
    // rep/geo works ride along with the photo descent: their pool factors
    // are applied inside every fused GN iteration; only photo works must
    // share one schedule state
    if (w.kind != PHOTO) continue;
    if (!w0) {
      w0 = &w;
      continue;
    }
    if (w.active_level != w0->active_level || w.n_levels != w0->n_levels)
      return 0;
    for (int l = 0; l < w.n_levels; ++l)
      if (w.iters[l] != w0->iters[l] || w.orig_iters[l] != w0->orig_iters[l])
        return 0;
  }
  // rep/geo-only work list: no photo schedule to share — fall back to the
  // phase-wise path (matches PyScheduler.fused_sig returning None)
  if (!w0) return 0;
  out[0] = w0->active_level;
  out[1] = w0->n_levels;
  for (int l = 0; l < w0->n_levels; ++l) {
    out[2 + l] = w0->iters[l];
    out[2 + kMaxLevels + l] = w0->orig_iters[l];
  }
  return 1;
}

// Mark photo-pool slots owned by live works (the descending factor set for
// run_segments' pool_descent mask). out must hold photo_cap bytes.
void df_sched_descent_slots(void* h, uint8_t* out) {
  auto* s = static_cast<Scheduler*>(h);
  size_t cap = s->photo_pool.active.size();
  for (size_t i = 0; i < cap; ++i) out[i] = 0;
  for (auto& w : s->work)
    if (w.kind == PHOTO && w.pool_slot >= 0 &&
        w.pool_slot < (int32_t)cap)
      out[w.pool_slot] = 1;
}

int32_t df_sched_error(void* h) { return static_cast<Scheduler*>(h)->error; }

// Drop works + pool entries touching a frame slot (WorkManager::Erase).
void df_sched_erase_frame(void* h, int32_t frame_slot) {
  auto* s = static_cast<Scheduler*>(h);
  for (auto it = s->work.begin(); it != s->work.end();) {
    if (it->dst_is_frame && it->dst == frame_slot) {
      if (it->pool_slot >= 0) s->pool_for(it->kind).active[it->pool_slot] = 0;
      it = s->work.erase(it);
    } else {
      ++it;
    }
  }
  Pool& p = s->photo_pool;
  for (size_t i = 0; i < p.active.size(); ++i)
    if (p.active[i] && p.is_frame[i] && p.dst[i] == (int32_t)frame_slot)
      p.active[i] = 0;
}

// Drop works + pool entries touching an evicted KEYFRAME slot: any factor
// whose src is the keyframe, or whose dst is the keyframe (non-frame
// targets). Mirrors PyScheduler.erase_keyframe; the marginal-prior fold
// happens Python-side before this is called.
void df_sched_erase_keyframe(void* h, int32_t kf_slot) {
  auto* s = static_cast<Scheduler*>(h);
  auto touches = [&](const Work& w) {
    if (w.kind == PHOTO)
      return w.src == kf_slot || (!w.dst_is_frame && w.dst == kf_slot);
    return w.src == kf_slot || w.dst == kf_slot;
  };
  for (auto it = s->work.begin(); it != s->work.end();) {
    if (touches(*it)) {
      if (it->pool_slot >= 0) s->pool_for(it->kind).active[it->pool_slot] = 0;
      it = s->work.erase(it);
    } else {
      ++it;
    }
  }
  for (auto it = s->pending_children.begin();
       it != s->pending_children.end();) {
    if (touches(*it))
      it = s->pending_children.erase(it);
    else
      ++it;
  }
  for (size_t i = 0; i < s->photo_pool.active.size(); ++i) {
    Pool& p = s->photo_pool;
    if (p.active[i] && (p.src[i] == kf_slot ||
                        (!p.is_frame[i] && p.dst[i] == kf_slot)))
      p.active[i] = 0;
  }
  for (Pool* p : {&s->rep_pool, &s->geo_pool})
    for (size_t i = 0; i < p->active.size(); ++i)
      if (p->active[i] && (p->src[i] == kf_slot || p->dst[i] == kf_slot))
        p->active[i] = 0;
}

// Copy a pool's state into caller buffers (each of capacity cap).
void df_sched_pool(void* h, int32_t kind, int32_t* src, int32_t* dst,
                   int32_t* level, uint8_t* is_frame, uint8_t* active) {
  auto* s = static_cast<Scheduler*>(h);
  Pool& p = s->pool_for(static_cast<WorkKind>(kind));
  size_t n = p.active.size();
  std::memcpy(src, p.src.data(), n * sizeof(int32_t));
  std::memcpy(dst, p.dst.data(), n * sizeof(int32_t));
  std::memcpy(level, p.level.data(), n * sizeof(int32_t));
  std::memcpy(is_frame, p.is_frame.data(), n);
  std::memcpy(active, p.active.data(), n);
}

// Pool slot assigned to a work (for Python-side per-factor payloads such as
// reprojection match data); -1 if none.
int32_t df_sched_work_slot(void* h, int64_t work_id) {
  auto* s = static_cast<Scheduler*>(h);
  Work* w = find(s, work_id);
  return w ? w->pool_slot : -1;
}

int32_t df_sched_num_works(void* h) {
  return static_cast<int32_t>(static_cast<Scheduler*>(h)->work.size());
}

}  // extern "C"
