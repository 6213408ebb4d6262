// Connect-4 strong solver (from scratch).
//
// TPU-native framework's oracle component, replacing the reference's vendored
// PascalPons binary (/root/reference/custom_alphazero/exact_solvers/c4solver,
// provenance noted at c4_exact_solver.py:10-13). Same score convention and a
// CLI speaking the same line protocol (c4_exact_solver.py:28-47), plus a C API
// for ctypes batch solving directly from bitboards.
//
// Techniques (all standard/public): bitboard with (HEIGHT+1) bits per column,
// alpha-beta negamax on the score bound, immediate-win and forced-block
// shortcuts, non-losing move masks, winning-spot move ordering, transposition
// table of upper bounds, iterative null-window search at the root.
//
// Score convention (matches the reference solver's output): 0 = draw under
// perfect play; positive = current player wins, magnitude = (W*H + 2 -
// total_plies_at_win) / 2 (win on the earliest stone scores highest); negative
// symmetric for losses. Empty 7x6 board solves to +1.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <string>
#include <vector>

namespace c4 {

constexpr int WIDTH = 7;
constexpr int HEIGHT = 6;
constexpr int AREA = WIDTH * HEIGHT;
constexpr int MIN_SCORE = -AREA / 2 + 3;
constexpr int MAX_SCORE = (AREA + 1) / 2 - 3;

using bb = uint64_t;

// Column c occupies bits [c*(H+1), c*(H+1)+H]; bit r within a column is the
// r-th cell from the bottom; the extra top bit stays empty (carry guard).
constexpr int COL_BITS = HEIGHT + 1;

constexpr bb bottom_mask_col(int col) { return bb(1) << (col * COL_BITS); }
constexpr bb top_mask_col(int col) {
  return bb(1) << (HEIGHT - 1 + col * COL_BITS);
}
constexpr bb column_mask(int col) {
  return ((bb(1) << HEIGHT) - 1) << (col * COL_BITS);
}

constexpr bb full_bottom() {
  bb b = 0;
  for (int c = 0; c < WIDTH; ++c) b |= bottom_mask_col(c);
  return b;
}
constexpr bb BOTTOM = full_bottom();
constexpr bb BOARD_MASK = BOTTOM * ((bb(1) << HEIGHT) - 1);

inline int popcount(bb x) { return __builtin_popcountll(x); }

// All cells where `pos` already has three aligned with an empty-able spot —
// i.e. the squares that would complete four-in-a-row for `pos`.
inline bb winning_spots(bb pos, bb mask) {
  // vertical
  bb r = (pos << 1) & (pos << 2) & (pos << 3);
  // horizontal and diagonals: shifts H (diag /), H+1 (horiz), H+2 (diag \)
  for (int dir : {COL_BITS - 1, COL_BITS, COL_BITS + 1}) {
    bb p = (pos << dir) & (pos << 2 * dir);
    r |= p & (pos << 3 * dir);
    r |= p & (pos >> dir);
    p = (pos >> dir) & (pos >> 2 * dir);
    r |= p & (pos >> 3 * dir);
    r |= p & (pos << dir);
  }
  return r & (BOARD_MASK ^ mask);
}

inline bool has_won(bb pos) {
  // Four aligned in any of the four directions.
  for (int dir : {1, COL_BITS - 1, COL_BITS, COL_BITS + 1}) {
    bb m = pos & (pos >> dir);
    if (m & (m >> 2 * dir)) return true;
  }
  return false;
}

struct Position {
  bb current = 0;  // stones of the side to move
  bb mask = 0;     // all stones
  int moves = 0;   // plies played

  bool can_play(int col) const { return (mask & top_mask_col(col)) == 0; }

  void play(int col) {
    current ^= mask;                       // switch perspective
    mask |= mask + bottom_mask_col(col);   // drop a stone in col
    ++moves;
  }

  void play_move_bit(bb move) {
    current ^= mask;
    mask |= move;
    ++moves;
  }

  bool is_winning_move(int col) const {
    return winning_spots(current, mask) & column_mask(col) &
           (mask + bottom_mask_col(col));
  }

  // Playable cells (one per non-full column).
  bb possible() const { return (mask + BOTTOM) & BOARD_MASK; }

  // Opponent squares that win for them immediately.
  bb opponent_winning_spots() const {
    return winning_spots(current ^ mask, mask);
  }

  // Moves that do not hand the opponent an immediate win.
  bb possible_non_losing_moves() const {
    bb poss = possible();
    bb opp_win = opponent_winning_spots();
    bb forced = poss & opp_win;
    if (forced) {
      if (forced & (forced - 1)) return 0;  // two threats: lost
      poss = forced;                        // must block
    }
    return poss & ~(opp_win >> 1);  // never play just below a winning spot
  }

  bool can_win_now() const {
    return winning_spots(current, mask) & possible();
  }

  bb key() const { return current + mask + BOTTOM; }

  // Move quality for ordering: threats created by playing `move`.
  int move_score(bb move) const {
    return popcount(winning_spots(current | move, mask));
  }
};

// Transposition table of score upper bounds: fixed-size, lossy overwrite.
// The entry count must be coprime with 2^32 (prime here) so that storing the
// truncated 32-bit key is collision-free by the Chinese remainder theorem:
// two keys sharing both (key % size) and (key % 2^32) would have to differ
// by a multiple of size * 2^32 > the 49-bit key space.
class Table {
 public:
  explicit Table(size_t entries = 8388617 /* prime > 2^23 */)
      : size_(entries), keys_(size_, 0), vals_(size_, 0) {}

  void reset() {
    std::fill(keys_.begin(), keys_.end(), 0);
    std::fill(vals_.begin(), vals_.end(), 0);
  }

  void put(bb key, int8_t val) {
    size_t i = index(key);
    keys_[i] = uint32_t(key);  // truncated key; size > 2^32/size collisions ok
    vals_[i] = val;
  }

  int get(bb key) const {
    size_t i = index(key);
    return keys_[i] == uint32_t(key) ? vals_[i] : 0;
  }

 private:
  size_t index(bb key) const { return key % size_; }
  size_t size_;
  std::vector<uint32_t> keys_;
  std::vector<int8_t> vals_;
};

class Solver {
 public:
  uint64_t nodes = 0;

  // Negamax with alpha-beta over score bounds; assumes the side to move
  // cannot win this ply (checked by callers) and nobody has won yet.
  int negamax(const Position& p, int alpha, int beta) {
    ++nodes;
    bb next = p.possible_non_losing_moves();
    if (next == 0)  // every move loses
      return -(AREA - p.moves) / 2;
    if (p.moves >= AREA - 2)  // board fills before anyone can win
      return 0;

    int min = -(AREA - 2 - p.moves) / 2;  // opponent can't win before then
    if (alpha < min) {
      alpha = min;
      if (alpha >= beta) return alpha;
    }
    int max = (AREA - 1 - p.moves) / 2;  // we can't win before then
    if (int cached = table_.get(p.key()); cached)
      max = cached + MIN_SCORE - 1;
    if (beta > max) {
      beta = max;
      if (alpha >= beta) return beta;
    }

    // Order moves: static centre-first order, then by threats created.
    struct Entry { bb move; int score; };
    Entry entries[WIDTH];
    int n = 0;
    for (int i = 0; i < WIDTH; ++i) {
      int col = ORDER[i];
      if (bb move = next & column_mask(col)) {
        entries[n].move = move;
        entries[n].score = p.move_score(move);
        ++n;
      }
    }
    // Stable insertion sort descending by score (keeps centre-first ties).
    for (int i = 1; i < n; ++i) {
      Entry e = entries[i];
      int j = i;
      while (j > 0 && entries[j - 1].score < e.score) {
        entries[j] = entries[j - 1];
        --j;
      }
      entries[j] = e;
    }

    for (int i = 0; i < n; ++i) {
      Position q = p;
      q.play_move_bit(entries[i].move);
      int score = -negamax(q, -beta, -alpha);
      if (score >= beta) return score;
      if (score > alpha) alpha = score;
    }
    table_.put(p.key(), int8_t(alpha - MIN_SCORE + 1));
    return alpha;
  }

  // Full-strength solve with iterative null-window narrowing.
  int solve(const Position& p) {
    if (p.can_win_now()) return (AREA + 1 - p.moves) / 2;
    int min = -(AREA - p.moves) / 2;
    int max = (AREA + 1 - p.moves) / 2;
    while (min < max) {
      int med = min + (max - min) / 2;
      if (med <= 0 && min / 2 < med) med = min / 2;
      else if (med >= 0 && max / 2 > med) med = max / 2;
      int r = negamax(p, med, med + 1);  // null-window: compare to med
      if (r <= med) max = r;
      else min = r;
    }
    return min;
  }

  void reset() { table_.reset(); }

 private:
  static constexpr int ORDER[WIDTH] = {3, 2, 4, 1, 5, 0, 6};
  Table table_;
};

// Parse a 1-indexed move string ("4453..."); returns false on illegal input
// or if the game already ended mid-sequence.
inline bool setup(Position& p, const char* moves) {
  p = Position{};
  for (const char* c = moves; *c; ++c) {
    if (*c < '1' || *c > '0' + WIDTH) return false;
    int col = *c - '1';
    if (!p.can_play(col)) return false;
    if (p.is_winning_move(col)) return false;  // finished games unsupported
    p.play(col);
  }
  return true;
}

}  // namespace c4

// ---------------------------------------------------------------------------
// C API (ctypes)
// ---------------------------------------------------------------------------

extern "C" {

void* c4_new() { return new c4::Solver(); }

void c4_free(void* solver) { delete static_cast<c4::Solver*>(solver); }

void c4_reset(void* solver) { static_cast<c4::Solver*>(solver)->reset(); }

// Solve a position given as a move string; returns the score, or -128 on
// invalid input (illegal/finished sequence).
int c4_solve_moves(void* solver, const char* moves) {
  c4::Position p;
  if (!c4::setup(p, moves)) return -128;
  return static_cast<c4::Solver*>(solver)->solve(p);
}

// Solve directly from bitboards (current-player stones + occupancy mask),
// bit layout: bit = col * (HEIGHT+1) + row, row 0 = bottom. `plies` = stones
// on the board. Assumes a legal, unfinished position.
int c4_solve_bitboard(void* solver, uint64_t current, uint64_t mask,
                      int plies) {
  if (c4::has_won(current) || c4::has_won(current ^ mask)) return -128;
  c4::Position p;
  p.current = current;
  p.mask = mask;
  p.moves = plies;
  return static_cast<c4::Solver*>(solver)->solve(p);
}

// Batch interface: scores[i] = score of the i-th '\n'-free move string.
void c4_solve_batch(void* solver, const char** moves, int n, int* scores) {
  for (int i = 0; i < n; ++i) scores[i] = c4_solve_moves(solver, moves[i]);
}

uint64_t c4_nodes(void* solver) {
  return static_cast<c4::Solver*>(solver)->nodes;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CLI: line-per-position stdin/stdout protocol compatible with the reference
// wrapper (c4_exact_solver.py:28-47): for each input line of 1-indexed moves,
// print "<moves> <score> <nodes> <time_us>". "-b <book>" is accepted and
// ignored (no opening book needed; kept for CLI compatibility).
// ---------------------------------------------------------------------------

#ifdef C4_CLI
int main(int argc, char** argv) {
  (void)argc;
  (void)argv;
  c4::Solver solver;
  std::string line;
  char buf[256];
  while (std::fgets(buf, sizeof(buf), stdin)) {
    line = buf;
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    c4::Position p;
    if (!c4::setup(p, line.c_str())) {
      std::fprintf(stderr, "Invalid position: %s\n", line.c_str());
      continue;
    }
    solver.nodes = 0;
    auto t0 = std::chrono::steady_clock::now();
    int score = solver.solve(p);
    auto us = std::chrono::duration_cast<std::chrono::microseconds>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
    std::printf("%s %d %llu %lld\n", line.c_str(), score,
                (unsigned long long)solver.nodes, (long long)us);
  }
  return 0;
}
#endif
