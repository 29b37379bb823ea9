import {Router} from '@tiny/http';
import type {Task} from './model.ts';
import * as store from './store.ts';

export {TaskFilter} from './filters.ts';

export interface ApiOptions {
  prefix: string;
  maxBody: number;
}

export type Handler = (req: Request) => Promise<Response>;

export enum Status {
  Open,
  Done,
}

const DEFAULTS = {prefix: '/api', maxBody: 1 << 20};

export class TaskApi {
  // class-body methods are in the grammar's envelope since round 5
  // (constructor stays excluded — a keyword, not a join-safe symbol)
  constructor(private opts: ApiOptions) {}

  routes(): Router {
    const router = new Router(this.opts.prefix);
    router.get('/tasks', listTasks);
    return router;
  }

  describe = () => {
    return formatPrefix(this.opts.prefix);
  };

  first<T>(xs: T[]): T {
    return xs[0];
  }
}

export async function listTasks(req: Request): Promise<Response> {
  const open = await store.query({status: Status.Open});
  return respond(open);
}

export const respond = (body: unknown) => {
  return new Response(JSON.stringify(body));
};

function withRetry(handler: Handler, attempts = 3): Handler {
  return async (req) => {
    let err;
    for (let i = 0; i < attempts; i++) {
      try {
        return await handler(req);
      } catch (e) {
        err = e;
      }
    }
    throw err;
  };
}

export default new TaskApi(DEFAULTS);

export abstract class BaseView {
  abstract render(): Response;

  #trace(msg: string) {
    return logLine(msg);
  }

  show() {
    this.#trace('show');
    return this.render();
  }
}

// object-literal method AFTER a class has closed — extent-aware
// ownership (wave 7) keeps it off BaseView
export const viewRegistry = {
  register(tag: string, view: BaseView) {
    return catalog.set(tag, view);
  },
};
