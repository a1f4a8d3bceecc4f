public class CpuScale {
  static long work(long seed, long iters) {
    long h = seed;
    for (long i = 0; i < iters; i++) { h ^= h << 13; h ^= h >>> 7; h ^= h << 17; h += i; }
    return h;
  }
  public static void main(String[] a) throws Exception {
    int threads = Integer.parseInt(a[0]);
    long iters = 4_000_000_000L / threads;
    Thread[] ts = new Thread[threads];
    long[] sink = new long[threads];
    long t0 = System.nanoTime();
    for (int i = 0; i < threads; i++) { final int k = i;
      ts[i] = new Thread(() -> sink[k] = work(k + 1, iters)); ts[i].start(); }
    for (Thread t : ts) t.join();
    System.out.println(threads + " threads: " + (System.nanoTime() - t0) / 1e9 + "s sink=" + sink[0]);
  }
}
