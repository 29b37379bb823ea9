import java.util.ArrayList;
import java.util.List;

public final class Tracker {
    private final List<String> tasks = new ArrayList<>();

    public Tracker(List<String> seed) {
        register(this);
    }

    static <T> List<T> pair(T a, T b) {
        return listOf(a, b);
    }

    public int add(String title) {
        tasks.add(title);
        return tasks.size();
    }

    static final class Entry {
        int weight(int base) {
            return scale(base);
        }
    }

    protected synchronized List<String> snapshot() {
        return new ArrayList<>(tasks);
    }

    private static boolean valid(String title) {
        return title != null && !title.isEmpty();
    }
}

abstract class Store {
    public abstract void persist(List<String> rows);

    public void flush() {
        persist(snapshotAll());
    }
}

interface Sink {
    <T> void accept(T row);
}

record TaskRow(String title, boolean done) {
}
